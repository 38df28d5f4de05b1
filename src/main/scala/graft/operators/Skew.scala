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
