package graft.sinks

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.DataFrame

/** Database persistence — the write-back half of the reference's
  * PostgreSQL-table target (reference:
  * src/pipeline/persistence/batch_writer.py:81 `write` with
  * INSERT/APPEND/REPLACE/UPSERT, :456 `write_batch` chunked writes, :181
  * `_write_copy` bulk transport).
  *
  * Spark's JDBC sink IS the distributed `write_batch`: every partition
  * opens its own connection and streams its rows in `batchsize`d
  * prepared-statement batches — N executors write in parallel where the
  * reference pages through one connection (`_write_copy`'s COPY is a
  * Postgres transport optimisation; the parallelism here dominates it).
  *
  * UPSERT: row-at-a-time ON CONFLICT from executors would deadlock-prone
  * interleave on the target; instead the delta lands in a staging table
  * (parallel append — the cheap, conflict-free part), and ONE driver-side
  * `MERGE INTO` moves staging into the target inside the database's own
  * transaction (reference `_write_upsert` is also a single transaction,
  * batch_writer.py:230). The big data transfer stays distributed; only
  * the set-based merge statement runs serially, inside the DB.
  */
object JdbcWriter {

  /** Write with BatchWriter strategy semantics. `numPartitions` caps
    * parallel connections (the reference's pool_size analogue);
    * `batchsize` is rows per JDBC batch (reference chunksize). Stats
    * come from an Observation on the written plan, like BatchWriter. */
  def write(df: DataFrame, url: String, table: String,
            strategy: BatchWriter.Strategy,
            numPartitions: Int = 8, batchsize: Int = 1000): BatchWriter.WriteStats = {
    val t0 = System.nanoTime()
    val obs = org.apache.spark.sql.Observation()
    // partition count from the RAW plan: touching .rdd on the observed
    // dataset would plan a second query execution for the same
    // Observation and silently zero its metrics
    val n = math.min(numPartitions, math.max(1, df.rdd.getNumPartitions))
    val observed = df.coalesce(n).observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    def writer(mode: String) =
      observed.write.mode(mode).option("batchsize", batchsize)
    strategy match {
      case BatchWriter.Insert  => writer("errorifexists").jdbc(url, table, new Properties())
      case BatchWriter.Append  => writer("append").jdbc(url, table, new Properties())
      case BatchWriter.Replace =>
        // truncate-and-load keeps the table's DDL/grants (reference
        // _write_replace TRUNCATEs rather than dropping)
        writer("overwrite").option("truncate", "true").jdbc(url, table, new Properties())
      case BatchWriter.Upsert(keys) => upsert(observed, url, table, keys, batchsize)
    }
    val written = obs.get.getOrElse("rows", 0L) match {
      case n: java.lang.Number => n.longValue()
      case other               => other.toString.toLong
    }
    BatchWriter.WriteStats(s"$url#$table",
      strategy.getClass.getSimpleName.stripSuffix("$"), written,
      (System.nanoTime() - t0) / 1000000)
  }

  private def upsert(delta: DataFrame, url: String, table: String,
                     keys: Seq[String], batchsize: Int): Unit = {
    val staging = s"${table}_graft_staging"
    withConnection(url) { conn =>
      dropIfExists(conn, staging)
    }
    delta.write.mode("errorifexists").option("batchsize", batchsize)
      .jdbc(url, staging, new Properties())
    // Spark's JDBC writer creates columns as quoted identifiers; quote
    // them here too or Derby folds the names to uppercase and misses.
    // SET targets are unqualified per the SQL standard (Derby enforces).
    def q(c: String) = "\"" + c + "\""
    val cols = delta.columns
    val nonKeys = cols.filterNot(keys.contains)
    val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val setClause = nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
    val insertCols = cols.map(q).mkString(", ")
    val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
    val merge =
      s"""MERGE INTO $table t USING $staging s ON ($on)
         |WHEN MATCHED THEN UPDATE SET $setClause
         |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(merge) finally st.close()
      dropIfExists(conn, staging)
    }
  }

  private def dropIfExists(conn: Connection, table: String): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(s"DROP TABLE $table")
    catch { case _: java.sql.SQLException => () } // didn't exist
    finally st.close()
  }

  private def withConnection[T](url: String)(f: Connection => T): T = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }
}
