package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Token-budget-constrained corpus selection: keep the highest-quality
  * documents — in total (quality DESC, doc_id ASC) order — whose
  * running token total still fits a budget. The budgeted-selection
  * step of data-constrained curation (pick the best B tokens, not the
  * best fraction); re-expresses the reference's scored-filter
  * transform family (src/pipeline/transformation/config_transformer
  * .py:204-350 filter verbs) with a global-order constraint those
  * verbs cannot state.
  *
  * Why this shape at 100 TB: a naive windowed cumulative sum orders
  * the WHOLE corpus in one task. Here the global order is recovered
  * with the same two-level trick as [[Packing.packSequences]] —
  * deterministic ARITHMETIC buckets over the quality value (6-dp
  * scores land in [0,1], so bucket = floor((1-q)·B) needs no range
  * sampling), a within-bucket window, and a driver-side exclusive
  * prefix over the buckets-sized totals table. Because bucket order
  * IS quality order, any bucket whose offset already exceeds the
  * budget is dropped BEFORE the window sort: with a budget that keeps
  * 1% of a 100 TB corpus, 99% of it is never sorted — selection cost
  * tracks the kept prefix plus one aggregation pass, not the corpus.
  */
object Selection {

  /** Docs selected greedily by quality until `budget` tokens are
    * packed: (doc_id, n_tokens, quality_score, cum_tokens), where
    * cum_tokens is the running total in (quality DESC, id ASC) order
    * and every kept row has cum_tokens <= budget. Degenerate docs
    * (empty text / zero tokens — their ratio scores are NaN) are
    * excluded up front. A doc larger than the remaining budget is
    * skipped AND stops the scan (strict prefix semantics — the greedy
    * frontier, not best-fit; [[Packing.packBestFit]] is the
    * gap-filling form). */
  def selectByBudget(docs: DataFrame, budget: Long, buckets: Int = 4096,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val scored = TextAnalysis.qualityScore(docs, textCol)
      .where(col("n_chars_calc") > 0 && col("n_tokens") > 0)
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        col("quality_score"))
      // quality lands in [0,1] by construction (weights sum to 1);
      // bucket 0 = best. least() guards the q=0.0 edge landing on B.
      .withColumn("bucket", least(
        floor((lit(1.0) - col("quality_score")) * buckets).cast("long"),
        lit(buckets - 1L)))
    // buckets-sized totals -> driver exclusive prefix; bucket order is
    // quality order, so the prefix IS each bucket's starting offset
    val totals = scored.groupBy("bucket").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, t)) => (b, acc + t)
    }.tail.zip(totals).map { case ((b, end), (_, t)) => (b, end - t) }
    val spark = docs.sparkSession
    import spark.implicits._
    // the scale lever: buckets starting past the budget can contain no
    // kept row — they never reach the window sort
    val live = offsets.filter(_._2 <= budget).toSeq.toDF("bucket", "bucket_offset")
    val w = Window.partitionBy("bucket")
      .orderBy(col("quality_score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.join(broadcast(live), "bucket")
      .withColumn("cum_tokens", col("bucket_offset") + sum("n_tokens").over(w))
      .where(col("cum_tokens") <= budget)
      .select(col(idCol), col("n_tokens"), col("quality_score"), col("cum_tokens"))
  }
}
