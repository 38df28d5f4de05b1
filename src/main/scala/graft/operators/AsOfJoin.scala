package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the temporal join Spark's built-in
  * operators don't express directly: each left row picks the latest
  * right row with the same key and `rightTs <= leftTs`.
  *
  * Implementation is the union + running-last-value pattern, not a range
  * join: tag both sides, union them, sort within each key by (ts, tag)
  * and carry the right side's values forward with
  * `last(..., ignoreNulls)` over the preceding frame, then keep only
  * left rows. One shuffle on the key, a per-key sort, zero row
  * amplification — at 100 TB this behaves like any windowed aggregation,
  * where a naive `l.ts >= r.ts` range join would be a quadratic
  * per-key blowup. Ties (equal timestamps) resolve inclusively: the
  * right row sorts before the left row, matching ASOF `>=` semantics. */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto each left row
    * @param inner     drop left rows with no prior right row (ASOF JOIN
    *                  default); `false` keeps them with nulls (LEFT ASOF) */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           valueCols: Seq[String], inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    // __r_matched marks real right rows, so `inner` works even when a
    // carried value column is legitimately null
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side"),
        lit(null).cast("int").as("__r_matched")) ++
        leftCols.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side"),
        lit(1).as("__r_matched")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy("__key")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col("*") +:
        (("__r_matched" +: valueCols.toList).map(c =>
          last(col(if (c == "__r_matched") c else s"__r_$c"), ignoreNulls = true)
            .over(w).as(s"__asof_$c"))): _*)
    val onlyLeft = carried.where(col("__side") === 1)
    val matched = if (inner)
      onlyLeft.where(col("__asof___r_matched").isNotNull)
    else onlyLeft
    matched.select(leftCols.map(col) ++
      valueCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }
}
