package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for shuffles.
  *
  * AQE's skew-join splitting (on in [[graft.Sessions.tuning]]) handles
  * most skew at runtime by subdividing oversized shuffle partitions.
  * Salting is the plan-level tool for the cases AQE can't reach: a
  * skewed aggregation (AQE never splits a single group) and joins whose
  * skewed side must shuffle anyway. The groupBy-side two-phase pattern
  * lives in [[graft.functions.saltKey]]; this adds the join form. */
object Skew {

  /** Skew diagnosis: per-key row counts with each key's share of the
    * table and its skew factor (count / mean count across keys) for the
    * top `topK` heaviest keys. The number a capacity review wants before
    * choosing between AQE, salting, or a broadcast — one grouped
    * aggregate plus a single-row mean broadcast, cheap at any scale. */
  def report(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(
      sum("n_rows").as("total_rows"),
      count(lit(1)).as("n_keys"))
    // top-K via orderBy+limit (distributed TakeOrdered — key cardinality
    // can be huge, so no global window over the counts relation); the
    // rank window then runs over at most topK rows
    val top = counts.crossJoin(broadcast(stats))
      .withColumn("share", round(col("n_rows") / col("total_rows"), 6))
      .withColumn("skew_factor",
        round(col("n_rows") * col("n_keys") / col("total_rows"), 6))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(topK)
    // rank the ≤topK survivors without a WindowExec: a global window
    // (even one partitioned by a constant — the optimizer folds that
    // away) logs the "No Partition Defined" warning on every run, which
    // drowns real warnings in bench logs. Instead fold the ≤topK rows
    // into ONE array, sort it (negated count ⇒ descending, then key),
    // and posexplode — the position IS the rank, and the single-row
    // aggregate is exactly the data movement a 20-row ranking needs.
    top
      .agg(sort_array(collect_list(struct(
        (-col("n_rows")).as("__neg_n"), col(keyCol).as("__k"),
        col("n_rows").as("__n"), col("share").as("__share"),
        col("skew_factor").as("__sf")))).as("__xs"))
      .select(posexplode(col("__xs")).as(Seq("__pos", "__x")))
      .select(
        col("__x.__k").as(keyCol), col("__x.__n").as("n_rows"),
        col("__x.__share").as("share"), col("__x.__sf").as("skew_factor"),
        (col("__pos") + 1).cast("long").as("rk"))
  }

  /** Salted equi-join on `key`: the big (skewed) side gets a
    * deterministic per-row salt in [0, buckets), the small side is
    * replicated once per salt value, and the join runs on (key, salt) —
    * a hot key's rows spread over `buckets` shuffle partitions instead
    * of one straggler task. Cost: small side × buckets, so size the
    * bucket count to the skew factor, not higher. Row-deterministic
    * salt (hash of the big side's row) keeps retried tasks identical.
    *
    * Inner and left joins only: a right/full join would need unmatched
    * replicated rows deduplicated back. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 8, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val salt = pmod(hash(big.columns.map(col): _*), lit(buckets))
    val saltedBig = big.withColumn("__graft_salt", salt)
    val replicated = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicated, Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }
}
