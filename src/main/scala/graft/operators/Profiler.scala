package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.davg

/** Column-level data profiling: one row per column with row/null/distinct
  * counts, numeric min/max/mean, and string/date min/max.
  *
  * Reference: the platform surfaces table shape through
  * src/pipeline/ingestion/batch_ingestor.py:375 (`get_table_info` —
  * schema + row count) and validates columns in
  * src/pipeline/transformation/schema_validator.py; this operator is the
  * full profiling pass a data-quality gate runs before accepting a drop.
  *
  * Shape: a fixed number of aggregate passes regardless of column count
  * — a wide min/max/mean/null aggregate, plus (exact form only) one
  * multi-distinct aggregate, cross-joined as single-row relations — then
  * an unpivot of the one result row into (column, stats) rows.
  *
  * Scale note: the exact COUNT(DISTINCT c1), ..., COUNT(DISTINCT cN)
  * combination makes Catalyst expand the input N ways before the
  * shuffle (one Expand branch per distinct aggregate) — exact
  * multi-column distincts are fundamentally that expensive everywhere.
  * At 100 TB use `approxProfile`: HyperLogLog++ sketches for every
  * column in ONE non-expanded scan, ~KB of state per column regardless
  * of cardinality. `profile` is the exact, oracle-verified form;
  * `approxProfile` is the scale path (error-bound spec-tested).
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = exactOrApprox(df, exact = true)

  def approxProfile(df: DataFrame, rsd: Double = 0.01): DataFrame =
    exactOrApprox(df, exact = false, rsd)

  private def exactOrApprox(df: DataFrame, exact: Boolean,
                            rsd: Double = 0.01): DataFrame = {
    val fields = df.schema.fields.toSeq
    val perCol = fields.flatMap { f =>
      val c = col(f.name)
      val isNum = f.dataType match {
        case _: NumericType => true
        case _              => false
      }
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nulls_${f.name}"),
        (if (isNum) min(c).cast("double") else lit(null).cast("double"))
          .as(s"__minn_${f.name}"),
        (if (isNum) max(c).cast("double") else lit(null).cast("double"))
          .as(s"__maxn_${f.name}"),
        (if (isNum) round(davg(c), 6) else lit(null).cast("double"))
          .as(s"__mean_${f.name}"),
        (if (isNum) lit(null).cast("string") else min(c).cast("string"))
          .as(s"__mins_${f.name}"),
        (if (isNum) lit(null).cast("string") else max(c).cast("string"))
          .as(s"__maxs_${f.name}"))
    }
    // Distinct counts live in their OWN aggregate. Mixing N exact
    // COUNT(DISTINCT) with the wide min/max/mean aggregate makes Catalyst
    // run every non-distinct aggregate over the N-way-Expanded input —
    // measured 5x slower than the two aggregates side by side. The
    // cross-join of two single-row aggregates keeps it one action; the
    // approx (HLL) form has no Expand, so it stays inside one aggregate.
    val ndAggs = fields.map { f =>
      (if (exact) count_distinct(col(f.name))
       else approx_count_distinct(col(f.name), rsd))
        .cast("long").as(s"__nd_${f.name}")
    }
    val aggs = count(lit(1)).as("__n") +: perCol
    val wide =
      if (exact)
        df.agg(aggs.head, aggs.tail: _*)
          .crossJoin(df.agg(ndAggs.head, ndAggs.tail: _*))
      else {
        val all = aggs ++ ndAggs
        df.agg(all.head, all.tail: _*)
      }

    // Unpivot the single wide row into one row per column. The struct
    // array is built from the already-aggregated scalars, so this is a
    // projection over one row — no second scan, no shuffle.
    val entries = fields.map { f =>
      struct(
        lit(f.name).as("column_name"),
        lit(f.dataType.typeName).as("data_type"),
        col("__n").as("n_rows"),
        col(s"__nulls_${f.name}").as("n_nulls"),
        col(s"__nd_${f.name}").as("n_distinct"),
        col(s"__minn_${f.name}").as("min_num"),
        col(s"__maxn_${f.name}").as("max_num"),
        col(s"__mean_${f.name}").as("mean_val"),
        col(s"__mins_${f.name}").as("min_str"),
        col(s"__maxs_${f.name}").as("max_str"))
    }
    wide.select(explode(array(entries: _*)).as("p"))
      .select("p.*")
      .orderBy("column_name")
  }

  /** IQR outlier detection (Tukey fences): rows outside
    * [q1 - k*iqr, q3 + k*iqr] flagged `is_outlier`, with the bounds
    * attached for audit. The quartiles are ONE exact-percentile
    * aggregate whose single result row broadcasts back onto the scan —
    * no collect, no second pass over the data. Bounds are rounded to
    * 6dp before comparison so the flag is engine-exact.
    *
    * Exact global percentiles buffer the value multiset in one
    * aggregation state — fine into the tens of millions of rows; at
    * 100 TB use [[iqrOutliersApprox]] (mergeable percentile_approx
    * sketch, same fences, bounded error). */
  def iqrOutliers(df: DataFrame, valueCol: String, k: Double = 1.5): DataFrame =
    flagByFences(df, valueCol, k,
      df.selectExpr(s"percentile($valueCol, array(0.25d, 0.75d)) AS q"))

  /** The 100 TB form: percentile_approx(accuracy) sketches instead of
    * exact buffering; error bounded by the sketch accuracy (spec-tested
    * against the exact fences). */
  def iqrOutliersApprox(df: DataFrame, valueCol: String, k: Double = 1.5,
                        accuracy: Int = 10000): DataFrame =
    flagByFences(df, valueCol, k,
      df.selectExpr(
        s"percentile_approx($valueCol, array(0.25d, 0.75d), $accuracy) AS q"))

  /** Equal-width histogram: `bins` buckets spanning [min, max], one
    * bucket row with count and bounds. The range comes from one min/max
    * aggregate whose single row broadcasts back onto the scan (no
    * collect, no second pass), the bucket id is pure double arithmetic
    * (engine-exact), and the count is one grouped aggregate — two scans
    * total at any scale, both full-speed columnar. Degenerate ranges
    * (min = max) collapse into bucket 0. */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val bounds = df.agg(
        min(col(valueCol)).cast("double").as("mn"),
        max(col(valueCol)).cast("double").as("mx"))
      .withColumn("w", (col("mx") - col("mn")) / lit(bins.toDouble))
    df.crossJoin(broadcast(bounds))
      .withColumn("bucket", when(col("w") === 0, lit(0L)).otherwise(
        least(lit(bins - 1L), floor((col(valueCol) - col("mn")) / col("w")))))
      .groupBy("bucket", "mn", "w") // mn/w constant: no extra grouping cost
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"), col("n"),
        round(col("mn") + col("bucket") * col("w"), 6).as("bucket_lo"),
        round(col("mn") + (col("bucket") + 1) * col("w"), 6).as("bucket_hi"))
      .orderBy("bucket")
  }

  /** Corpus datasheet ("Datasheets for Datasets", Gebru et al. 2021 —
    * the release-notes rollup a training corpus ships with): per
    * (lang, source) group plus ROLLUP subtotals and a grand total,
    * report document / character / whitespace-token volumes, the
    * exact-duplicate count (docs beyond the first per content hash)
    * and the PII-bearing document count (any email/IPv4/phone match,
    * the [[TextAnalysis]] patterns).
    *
    * Shape at 100 TB: ONE corpus scan computing doc-sized signals
    * (hash, token count, three regex flags — all codegen'd), then a
    * rollup aggregate whose only heavy member is the exact
    * COUNT(DISTINCT fp); that distinct shuffles (group, fp) pairs,
    * which dedup'd corpora keep near-unique — the same cost class as
    * `dedup_exact`. Output is groups-sized (tiny). */
  def corpusDatasheet(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    def flags(pat: String): Column =
      when(regexp_count(text, lit(pat)) > 0, 1L).otherwise(0L)
    docs
      .select(col("lang"), col("source"), text,
        md5(text).as("fp"),
        graft.functions.wsTokenCount(text).as("toks"),
        greatest(flags(TextAnalysis.emailPattern),
          flags(TextAnalysis.ipv4Pattern),
          flags(TextAnalysis.phonePattern)).as("pii"))
      .rollup("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(text)).cast("long").as("n_chars"),
        sum(col("toks")).cast("long").as("n_tokens"),
        (count(lit(1)) - countDistinct(col("fp"))).cast("long").as("dup_docs"),
        sum(col("pii")).cast("long").as("pii_docs"))
      .orderBy(asc_nulls_first("lang"), asc_nulls_first("source"))
  }

  private def flagByFences(df: DataFrame, valueCol: String, k: Double,
                           quartiles: DataFrame): DataFrame = {
    val q = quartiles
      .select(col("q")(0).as("q1"), col("q")(1).as("q3"))
      .select(
        round(col("q1") - lit(k) * (col("q3") - col("q1")), 6).as("lo"),
        round(col("q3") + lit(k) * (col("q3") - col("q1")), 6).as("hi"))
    df.crossJoin(broadcast(q))
      .withColumn("is_outlier", col(valueCol) < col("lo") || col(valueCol) > col("hi"))
  }
}
