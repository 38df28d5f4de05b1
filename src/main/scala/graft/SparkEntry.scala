package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{LlmQueries, OperatorQueries, Relational, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the checklist each
  * entry maps to. `queries` keys with an `oracleSql` entry are verified
  * row/schema/hash-exact against DuckDB at sf0.01; keys without one are
  * rows-only (non-SQL-expressible: hash-seeded LSH candidate sets). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Sessions.tune(spark)
    Relational.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = Relational.queries ++ OperatorQueries.queries ++
      LlmQueries.queries ++ StreamQueries.queries
    // Every query assumes graft's runtime tuning (nanosAsLong, AQE, UTC).
    all.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => { Sessions.tune(s); fn(s, dir) })
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for rows-only ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ OperatorQueries.oracles ++
      LlmQueries.oracles ++ StreamQueries.oracles
}
