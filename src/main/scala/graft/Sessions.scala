package graft

import org.apache.spark.sql.SparkSession

/** Session construction + runtime tuning applied by every graft entrypoint.
  *
  * The reference platform centralises engine setup in its worker bootstrap
  * (reference: src/pipeline/workers/tasks.py:1-60); the Spark-native
  * equivalent is a tuned SparkSession. All settings below are runtime SQL
  * confs so they can also be applied to an externally-created session
  * (e.g. the driver harness) via [[Sessions.tune]].
  *
  * Scale rationale (100 TB / 1000-executor target):
  *  - AQE on: runtime shuffle-partition coalescing + skew-join splitting
  *    replace hand-tuned partition counts when data volume varies 1000x.
  *  - Broadcast threshold 64 MB: every dimension table in the star schema
  *    (region/nation/supplier/customer/part at typical scale factors)
  *    broadcast-joins instead of shuffling the fact table.
  *  - Parquet nanos-as-long: the `events` table carries TIMESTAMP(NANOS)
  *    which Spark's vectorized reader rejects; we read the raw int64 and
  *    truncate to microseconds in [[graft.sources.Ingestor.events]].
  */
object Sessions {
  val tuning: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // Scan-split sizing. The default 128 MB maxPartitionBytes is right
    // when per-task data is huge (a 100 TB table is >100k such splits —
    // set it back upward in a cluster submit conf); on the single-node
    // SFs this library's entrypoints actually run, it UNDER-PARALLELIZES
    // catastrophically: sf1 lineitem is ~124 MB in 16 files, which the
    // 128 MB bin-packer folds into ~2 scan tasks on 32 cores — measured
    // 3x end-to-end on a plain groupBy (q1 4.5 s -> 1.4 s with 16 MB
    // splits). 16 MB splits + 1 MB file-open cost keep every benched
    // table at >= cores scan tasks while leaving row-group alignment to
    // the reader.
    "spark.sql.files.maxPartitionBytes" -> (16L * 1024 * 1024).toString,
    "spark.sql.files.openCostInBytes" -> (1L * 1024 * 1024).toString,
    "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    "spark.sql.session.timeZone" -> "UTC",
  )

  /** Apply graft's runtime tuning to an existing session. Idempotent.
    * Also installs the worker-health listener (once per application) so
    * the CLI `workers` view has lifetime task-failure counts. */
  def tune(spark: SparkSession): SparkSession = {
    tuning.foreach { case (k, v) => spark.conf.set(k, v) }
    graft.pipeline.WorkerHealth.install(spark.sparkContext)
    spark
  }

  /** Local session for tests/tools. `cores` also sizes shuffle partitions:
    * on a real cluster you want 2-3x total cores; in local mode matching
    * the core count avoids tiny-task overhead. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    tuning.foreach { case (k, v) => b.config(k, v) }
    tune(b.getOrCreate())
  }
}
