package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of temporal join — the join Spark's built-in operators don't
  * express directly: each left row picks the nearest right row with the
  * same key, `backward` (latest right with rightTs <= leftTs — the ASOF
  * JOIN default) or `forward` (earliest right with rightTs >= leftTs),
  * optionally within a `tolerance` interval (pandas merge_asof's knobs).
  *
  * Implementation is the union + running-last-value pattern, not a range
  * join: tag both sides, union them, sort within each key by (ts, tag)
  * — descending for forward — and carry the right side's values across
  * with `last(..., ignoreNulls)` over the preceding frame, then keep
  * only left rows. One shuffle on the key, a per-key sort, zero row
  * amplification — at 100 TB this behaves like any windowed aggregation,
  * where a naive `l.ts >= r.ts` range join would be a quadratic
  * per-key blowup. Ties (equal timestamps) resolve inclusively in both
  * directions: the right row sorts before the left row at equal ts. */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto each left row
    * @param inner     drop left rows with no qualifying right row (ASOF
    *                  JOIN default); `false` keeps them with nulls
    * @param direction "backward" (rightTs <= leftTs, nearest) or
    *                  "forward" (rightTs >= leftTs, nearest)
    * @param tolerance max |leftTs - rightTs| as an interval expression
    *                  (e.g. `expr("INTERVAL '30' MINUTE")`); matches
    *                  further away are treated as no-match */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           valueCols: Seq[String], inner: Boolean = true,
           direction: String = "backward",
           tolerance: Option[Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // __r_matched marks real right rows, so `inner` works even when a
    // carried value column is legitimately null; the matched right ts is
    // always carried too, for the tolerance check
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side"),
        lit(null).cast("int").as("__r_matched"),
        lit(null).cast(right.schema(rightTs).dataType).as("__r___rts")) ++
        leftCols.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side"),
        lit(1).as("__r_matched"), col(rightTs).as("__r___rts")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val ordTs = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy("__key")
      .orderBy(ordTs, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carryCols = "__r_matched" :: "__r___rts" :: valueCols.toList
    val carried = l.unionByName(r)
      .select(col("*") +:
        carryCols.map(c =>
          last(col(if (c.startsWith("__r")) c else s"__r_$c"), ignoreNulls = true)
            .over(w).as(s"__asof_$c")): _*)
    val onlyLeft = carried.where(col("__side") === 1)
    // a carried match qualifies if it exists and sits inside tolerance
    val gap = tolerance.map { tol =>
      if (direction == "backward") col("__ts") - col("__asof___r___rts") <= tol
      else col("__asof___r___rts") - col("__ts") <= tol
    }.getOrElse(lit(true))
    val qualified = col("__asof___r_matched").isNotNull && gap
    val matched = if (inner) onlyLeft.where(qualified)
      else onlyLeft
    matched.select(leftCols.map(col) ++
      valueCols.map(c =>
        when(qualified, col(s"__asof_$c")).otherwise(lit(null))
          .as(s"asof_$c")): _*)
  }
}
