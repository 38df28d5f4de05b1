package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy guards for training corpora, beyond the regex PII pass
  * ([[TextAnalysis.redactPii]]): k-anonymity suppression over
  * quasi-identifier columns — any row whose quasi-identifier combination
  * occurs fewer than k times is suppressed, so no released row is
  * re-identifiable to a group smaller than k (Sweeney 2002).
  *
  * One window pass partitioned by the quasi-identifiers: the group size
  * is a COUNT over the partition — a single hash shuffle on the
  * quasi-identifier key, no join, no second scan. At 100 TB the shuffle
  * carries only the projected quasi-identifier columns plus row payload;
  * skewed (very common) combinations are exactly the ones that pass the
  * k threshold, so skew never concentrates suppressed work.
  */
object Privacy {

  /** Keep rows whose quasi-identifier group has at least k members;
    * append the group size as `group_n` for audit. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("group_n", count(lit(1)).over(w))
      .where(col("group_n") >= k)
  }

  /** The audit view: every quasi-identifier combination with its size
    * and whether it would be suppressed at the given k. */
  def kAnonymityProfile(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("suppressed", col("group_n") < k)
}
