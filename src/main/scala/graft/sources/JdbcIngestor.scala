package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.Retry

/** Source-database ingestion — the Spark-native form of the reference's
  * chunked SQL reader.
  *
  * Reference: src/pipeline/ingestion/batch_ingestor.py:67 (`ingest`),
  * :102 (`ingest_batches` — LIMIT/OFFSET pagination loop), :323
  * (`_add_pagination`), :356 (`test_connection`), :375 (`get_table_info`).
  *
  * The reference paginates by appending `LIMIT n OFFSET m` and pulling
  * pages through one connection — O(table) sequential round-trips, and
  * OFFSET forces the source DB to re-scan skipped rows on every page.
  * Spark's JDBC source is the distributed re-expression of the same idea:
  * `partitionColumn/lowerBound/upperBound/numPartitions` splits the key
  * range into N disjoint `WHERE col >= lo AND col < hi` slices, and every
  * slice is fetched by an independent executor task in parallel. At
  * 100 TB that is the difference between one connection paging for days
  * and 1000 executors each draining their own range — and the range
  * predicates let the source use its index instead of OFFSET re-scans.
  *
  * Filters and projections on the returned DataFrame push down into the
  * remote query (visible as `PushedFilters` on the JDBC scan node), so
  * `jdbcTable(...).where(...).select(...)` ships the predicate to the
  * database rather than transferring the table.
  */
object JdbcIngestor {

  /** Key-range split spec — the distributed `_add_pagination`. `column`
    * must be numeric/date/timestamp; rows OUTSIDE [lower, upper] are
    * still read (Spark widens the first and last slice), so approximate
    * bounds are safe. */
  case class RangePartitioning(column: String, lower: Long, upper: Long,
                               numPartitions: Int)

  /** Read a table (or `(SELECT ...) alias` subquery) through JDBC.
    *
    * With `partitioning` the scan issues one range-sliced query per
    * partition; without it the whole table arrives through a single
    * connection (fine for dimension tables, wrong for facts — pass
    * bounds, or call [[probeBounds]] to derive them). */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                partitioning: Option[RangePartitioning] = None,
                options: Map[String, String] = Map.empty): DataFrame = {
    val props = new Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    partitioning match {
      case Some(p) =>
        spark.read.jdbc(url, table, p.column, p.lower, p.upper,
          p.numPartitions, props)
      case None =>
        spark.read.jdbc(url, table, props)
    }
  }

  /** Arbitrary-SQL ingestion (reference `ingest(query=...)`): the query
    * becomes a derived table so it can still be range-partitioned — each
    * executor fetches `SELECT * FROM (query) WHERE col-slice`. */
  def jdbcQuery(spark: SparkSession, url: String, query: String,
                partitioning: Option[RangePartitioning] = None,
                options: Map[String, String] = Map.empty): DataFrame = {
    val stripped = query.trim.stripSuffix(";")
    jdbcTable(spark, url, s"($stripped) graft_sub", partitioning, options)
  }

  /** Derive [min, max] bounds for `column` with one tiny remote
    * aggregate, so callers don't have to know the key range to get a
    * partitioned read (the reference's pagination loop discovers the end
    * of the table by reading it; this asks the database instead). */
  def probeBounds(spark: SparkSession, url: String, table: String,
                  column: String,
                  options: Map[String, String] = Map.empty): (Long, Long) = {
    // resolve the column's stored case from the remote schema and quote
    // it: a table created by Spark's JDBC writer has quoted-lowercase
    // identifiers, one created by unquoted DDL has uppercase — a bare
    // name in hand-written SQL matches only one of them
    val schema = jdbcTable(spark, url, table, None, options).schema
    val actual = schema.fieldNames.find(_.equalsIgnoreCase(column)).getOrElse(column)
    val q = "\"" + actual + "\""
    val bounds = jdbcTable(spark, url,
      s"(SELECT MIN($q) lo, MAX($q) hi FROM $table) graft_bounds",
      None, options).collect()(0)
    (toLong(bounds.get(0)), toLong(bounds.get(1)))
  }

  /** Partitioned read with auto-probed bounds: the one-call form of
    * "ingest this table in parallel". */
  def jdbcTableAutoPartitioned(spark: SparkSession, url: String,
                               table: String, column: String,
                               numPartitions: Int,
                               options: Map[String, String] = Map.empty): DataFrame = {
    val (lo, hi) = probeBounds(spark, url, table, column, options)
    jdbcTable(spark, url, table,
      Some(RangePartitioning(column, lo, hi, numPartitions)), options)
  }

  /** Column name/type/nullability + row count for a remote table
    * (reference `get_table_info`, batch_ingestor.py:375). The count runs
    * remotely as `SELECT COUNT(*)`, not by transferring rows. */
  def describeJdbcTable(spark: SparkSession, url: String, table: String,
                        options: Map[String, String] = Map.empty)
      : (org.apache.spark.sql.types.StructType, Long) = {
    val schema = jdbcTable(spark, url, table, None, options).schema
    val n = jdbcTable(spark, url,
      s"(SELECT COUNT(*) n FROM $table) graft_count", None, options)
      .collect()(0)
    (schema, toLong(n.get(0)))
  }

  /** Structured result of a driver-side connection probe: what a run
    * ledger wants to durably record about source connectivity. Spark has
    * no connection POOL to report on (each partition task opens and
    * closes its own JDBC connection), so the observable quantities are
    * the probe outcome, how many attempts it took, and the total probe
    * latency — plus, for a partitioned read, how many connections the
    * scan will open (= numPartitions).
    *
    * Reference: connection_manager.py:194 `get_pool_status` (pool
    * size / checked-out / overflow) and :147 `health_check`; this is the
    * shape those stats take when the "pool" is one connection per
    * executor task. */
  case class HealthReport(ok: Boolean, attempts: Int, totalMs: Long,
                          error: Option[String])

  /** Connection health check with exponential-backoff retry (reference
    * connection_manager.py:147 `health_check`): `ok` iff `probeSql` runs
    * within `maxRetries` attempts. Runs on the driver — it guards a
    * pipeline BEFORE a 1000-task read is scheduled, so a dead source
    * fails in milliseconds instead of as 1000 task failures. `probeSql`
    * defaults to the portable `SELECT 1`; Derby and DB2 need `VALUES 1`. */
  def healthCheckReport(url: String, probeSql: String = "SELECT 1",
                        maxRetries: Int = 3, baseDelayMs: Long = 100,
                        sleep: Long => Unit = Thread.sleep): HealthReport = {
    var attempts = 0
    val t0 = System.nanoTime()
    val err =
      try {
        Retry.withBackoff(maxAttempts = maxRetries, baseDelayMs = baseDelayMs,
          sleep = sleep) {
          attempts += 1
          var conn: Connection = null
          try {
            conn = DriverManager.getConnection(url)
            val st = conn.createStatement()
            try st.executeQuery(probeSql).close() finally st.close()
          } finally if (conn != null) conn.close()
        }
        None
      } catch { case scala.util.control.NonFatal(e) => Some(e.toString) }
    HealthReport(err.isEmpty, attempts, (System.nanoTime() - t0) / 1000000L,
      err)
  }

  /** Boolean form of [[healthCheckReport]], kept for call sites that
    * only gate on the outcome. */
  def healthCheck(url: String, probeSql: String = "SELECT 1",
                  maxRetries: Int = 3, baseDelayMs: Long = 100,
                  sleep: Long => Unit = Thread.sleep): Boolean =
    healthCheckReport(url, probeSql, maxRetries, baseDelayMs, sleep).ok

  private def toLong(v: Any): Long = v match {
    case null                 => 0L
    case n: java.lang.Number  => n.longValue()
    case d: java.sql.Date     => d.getTime
    case t: java.sql.Timestamp => t.getTime
    case other => other.toString.toLong
  }
}
