package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_timestamp

import graft.sinks.BatchWriter

/** Durable per-run execution stats: one parquet ledger row per pipeline
  * stage, appended at the end of every run.
  *
  * Reference: src/pipeline/workers/tasks.py:354 (`run_pipeline` returns
  * per-stage result dicts) + utils/logging.py (structured per-stage
  * logging); the reference's durable copy lives in its task backend. The
  * cluster-native equivalent is an append-only parquet table on shared
  * storage — queryable with the engine itself ("what did pipeline X
  * write yesterday" is a filter + sort over the ledger), and an append
  * of one tiny file per run never rewrites history (the same pattern a
  * transaction log uses; at 100 TB the ledger stays KBs/run regardless
  * of data volume). */
class RunLedger(dir: String) {
  import RunLedger.LedgerRow

  /** Append one row per stage (plus one for the write, when present). */
  def record(spark: SparkSession, runId: String, pipeline: String,
             stats: Seq[Pipeline.StageStats],
             writeStats: Option[BatchWriter.WriteStats] = None): Unit = {
    import spark.implicits._
    val stageRows = stats.map(s =>
      LedgerRow(runId, pipeline, s.stage, s.rows, s.durationMs,
        null, -1L, -1L, null))
    val writeRows = writeStats.toSeq.map(w =>
      LedgerRow(runId, pipeline, "write", w.rowsWritten, w.durationMs,
        w.strategy, w.rowsInserted, w.rowsUpdated, w.path))
    (stageRows ++ writeRows).toDF()
      .withColumn("recorded_at", current_timestamp())
      .coalesce(1) // a handful of rows; one ledger file per run
      .write.mode("append").parquet(dir)
  }

  /** The full ledger, newest first — "what ran, when, how much". */
  def runs(spark: SparkSession): DataFrame =
    spark.read.parquet(dir).orderBy(
      org.apache.spark.sql.functions.col("recorded_at").desc)

  def forPipeline(spark: SparkSession, pipeline: String): DataFrame =
    runs(spark).where(org.apache.spark.sql.functions.col("pipeline") === pipeline)
}

object RunLedger {
  case class LedgerRow(run_id: String, pipeline: String, stage: String,
                       rows: Long, duration_ms: Long, strategy: String,
                       rows_inserted: Long, rows_updated: Long,
                       output_path: String)
}
