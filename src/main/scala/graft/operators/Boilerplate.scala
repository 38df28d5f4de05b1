package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (CCNet / RefinedWeb style): a line
  * whose normalized form appears in >= `minDocs` DISTINCT documents is
  * template chrome (nav bars, cookie banners, license footers), not
  * content — drop it and keep the rest of the document. The line-wise
  * counterpart of the document-level dedup family ([[Dedup]]) and the
  * span-level family ([[Dedup.spanMask]]); re-expresses the reference's
  * row-level cleaning verbs (src/pipeline/transformation/
  * config_transformer.py:204-350) at sub-document granularity those
  * verbs cannot reach.
  *
  * Shape at 100 TB: one posexplode over the corpus (the line table is
  * the corpus re-keyed, never joined to itself), one two-level
  * count-distinct aggregation to line-hash granularity, and ONE join —
  * lines against the FLAGGED set only. The flagged set is the point:
  * boilerplate is by definition the high-frequency tail, so the set of
  * distinct flagged hashes is orders of magnitude smaller than the
  * corpus and broadcastable long after the line table is not. Keys are
  * md5 hashes (16 opaque bytes), so the aggregation and join never
  * shuffle line text.
  */
object Boilerplate {

  /** Per-document boilerplate profile + cleaned rebuild:
    * (doc_id, n_lines, n_boiler, boiler_fraction, clean_md5) where
    * clean_md5 fingerprints the document rebuilt from its non-flagged
    * lines (original text, original order, '\n'-joined). Lines are
    * normalized (trim + lowercase) before frequency counting so
    * indentation / case variants of the same chrome count as one line;
    * blank lines are never flagged (they carry no signal and would
    * otherwise always cross the threshold). */
  def removeBoilerplate(docs: DataFrame, minDocs: Int = 3,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would flag every non-blank line")
    val lines = docs
      .select(col(idCol), posexplode(split(coalesce(col(textCol), lit("")), "\n"))
        .as(Seq("pos", "line")))
      .withColumn("lh", md5(trim(lower(col("line")))))
      .withColumn("blank", trim(col("line")) === "")
    // two-level agg: (hash, doc) distinct -> per-hash doc frequency;
    // only hashes that cross the threshold survive to the join
    val flagged = lines.where(!col("blank"))
      .groupBy("lh").agg(countDistinct(idCol).as("line_df"))
      .where(col("line_df") >= minDocs)
      .select(col("lh"), lit(true).as("boiler"))
    lines
      .join(broadcast(flagged), Seq("lh"), "left")
      .withColumn("boiler", coalesce(col("boiler"), lit(false)) && !col("blank"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler"),
        round(sum(when(col("boiler"), 1L).otherwise(0L)) / count(lit(1)), 6)
          .as("boiler_fraction"),
        // collect_list skips the nulls the `when` leaves for flagged
        // lines; array_sort on (pos, line) structs restores document
        // order before the rebuild is fingerprinted
        md5(array_join(transform(
          array_sort(collect_list(when(!col("boiler"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n")).as("clean_md5"))
  }

  /** The flagged-line report itself: (lh, line_df, sample_line) for
    * every normalized line form crossing the threshold — the audit
    * artifact a cleaning run publishes alongside the cleaned corpus. */
  def boilerplateLines(docs: DataFrame, minDocs: Int = 3,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would flag every non-blank line")
    docs
      .select(col(idCol), explode(split(coalesce(col(textCol), lit("")), "\n")).as("line"))
      .withColumn("norm", trim(lower(col("line"))))
      .where(col("norm") =!= "")
      .groupBy(md5(col("norm")).as("lh"))
      .agg(countDistinct(idCol).as("line_df"), min("norm").as("sample_line"))
      .where(col("line_df") >= minDocs)
  }
}
