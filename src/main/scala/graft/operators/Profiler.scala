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
}
