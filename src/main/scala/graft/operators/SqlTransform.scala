package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** SQL transformation over a staged input view.
  *
  * Reference: src/pipeline/transformation/sql_transformer.py:49
  * (`transform` stages the DataFrame as table `input_data` and runs
  * arbitrary SQL), :160 (in-memory variant), :218
  * (`register_query_version`). The Spark-native equivalent is a temp view
  * + `spark.sql` — which means the "arbitrary SQL" is planned by Catalyst
  * like any native query: filters in the SQL text reach the parquet scan,
  * joins get broadcast/shuffle selection, nothing is interpreted row-wise.
  */
class SqlTransform(spark: SparkSession,
                   registryDir: Option[String] = None) {
  private val registry = mutable.Map[(String, Int), String]()
  private val history = mutable.ArrayBuffer[(String, Int, String)]()
  // Durable backing on shared storage (reference persists query versions
  // to its registry table; sql_transformer.py:218): versions registered
  // here load in a fresh session via the same directory.
  private val backing = registryDir.map(new graft.pipeline.DurableRegistry(_))

  /** Stage `df` as `viewName` (default `input_data`, matching the
    * reference's staging table) and run `sql` against it. */
  def transform(df: DataFrame, sql: String, viewName: String = "input_data"): DataFrame = {
    df.createOrReplaceTempView(viewName)
    spark.sql(sql)
  }

  /** Parameterized variant (reference `transform(query, parameters=...)`,
    * sql_transformer.py): named parameters bind through Spark's native
    * parameterized SQL — no string interpolation, no injection surface. */
  def transformParams(df: DataFrame, sql: String, params: Map[String, Any],
                      viewName: String = "input_data"): DataFrame = {
    df.createOrReplaceTempView(viewName)
    spark.sql(sql, params)
  }

  /** Stage several inputs at once (multi-table SQL). */
  def transformAll(inputs: Map[String, DataFrame], sql: String): DataFrame = {
    inputs.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    spark.sql(sql)
  }

  // ---- versioned query registry (reference sql_transformer.py:218) ----
  def registerQueryVersion(queryId: String, version: Int, sql: String,
                           description: String = ""): Unit = {
    backing.foreach(_.put(queryId, version, sql, description))
    registry((queryId, version)) = sql
    history += ((queryId, version, description))
  }

  /** Registration history, oldest first (reference
    * `get_transformation_history`): durable history when backed, this
    * session's registrations otherwise. */
  def transformationHistory(queryId: String): Seq[(Int, String)] =
    backing.map(_.history(queryId)).getOrElse(
      history.collect { case (id, v, d) if id == queryId => (v, d) }.toSeq)

  def getQuery(queryId: String, version: Int): Option[String] =
    registry.get((queryId, version)).orElse {
      val loaded = backing.flatMap(_.get(queryId, version))
      loaded.foreach(sql => registry((queryId, version)) = sql)
      loaded
    }

  def latestVersion(queryId: String): Option[Int] = {
    val vs = registry.keys.collect { case (id, v) if id == queryId => v } ++
      backing.flatMap(_.latestVersion(queryId))
    if (vs.nonEmpty) Some(vs.max) else None
  }

  def transformVersioned(df: DataFrame, queryId: String,
                         version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(queryId))
      .getOrElse(throw new NoSuchElementException(s"no versions for $queryId"))
    val sql = getQuery(queryId, v)
      .getOrElse(throw new NoSuchElementException(s"no query $queryId v$v"))
    transform(df, sql)
  }
}
