package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.{GraftSettings, IdempotencyLedger, Pipeline, RunLedger}

/** User-facing CLI: run a pipeline from a JSON spec file, look up a
  * run's recorded stats, list a pipeline's run history.
  *
  * Reference: src/cli/main.py — `run` (:46, loads a config file and
  * submits `run_pipeline`), `status` (:213, task status by id), and the
  * implicit history the task backend keeps. The reference CLI is a
  * Celery job *submitter*; a Spark batch library has no broker, so the
  * Spark-native re-expression runs the pipeline IN the CLI process
  * (exactly what `spark-submit --class graft.PipelineCli` does on a
  * cluster) and serves `status`/`history` from the durable
  * [[graft.pipeline.RunLedger]] parquet table instead of a result
  * backend — same queries, no extra service. Health checks stay inside
  * `run` (the pipeline's fail-fast source gate); worker listing has no
  * analogue (YARN/K8s owns executor inventory).
  *
  * Usage:
  * {{{
  *   PipelineCli run <spec.json> [--name NAME] [--ledger-dir DIR] [--idempotency-dir DIR]
  *   PipelineCli status <run_id> --ledger-dir DIR
  *   PipelineCli history <pipeline_name> --ledger-dir DIR [--limit N]
  * }}}
  */
object PipelineCli {

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "graft-pipeline-cli")
    spark.sparkContext.setLogLevel(GraftSettings.fromEnv().logLevel)
    val code =
      try execute(spark, args)
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** Parse + dispatch; returns a process exit code. Separated from
    * [[main]] so specs can drive the full CLI against the shared test
    * session and a temp ledger. All output goes through `Console.out`
    * (capturable with `Console.withOut`). `env` (default: the process
    * environment) feeds [[GraftSettings]] — deployment-level defaults
    * for the ledger/idempotency knobs, with the documented precedence
    * flag > env > default (spec-pinned via this parameter). */
  def execute(spark: SparkSession, args: Array[String],
              env: Map[String, String] = sys.env): Int = {
    val settings =
      try GraftSettings.fromEnv(env)
      catch {
        case e: IllegalArgumentException =>
          Console.err.println(s"invalid environment: ${e.getMessage}")
          return 2
      }
    def usage(): Int = {
      Console.err.println(
        """usage: PipelineCli run <spec.json> [--name NAME] [--ledger-dir DIR] [--idempotency-dir DIR] [--idempotency-ttl-days N]
          |       PipelineCli status <run_id> --ledger-dir DIR
          |       PipelineCli history <pipeline_name> --ledger-dir DIR [--limit N]""".stripMargin)
      2
    }
    parseArgs(args.toList) match {
      case Left(err) =>
        Console.err.println(err)
        usage()
      case Right((positional, flags)) =>
        (positional, flags) match {
          case (List("run", specPath), f) =>
            runCommand(spark, specPath, f, settings)
          case (List("status", runId), f) =>
            statusCommand(spark, runId, f, settings)
          case (List("history", pipeline), f) =>
            historyCommand(spark, pipeline, f, settings)
          case _ => usage()
        }
    }
  }

  /** `--key value` pairs anywhere after the subcommand; anything else
    * is positional. A flag with no value (end of args, or immediately
    * followed by another `--flag`) is a hard usage error — silently
    * dropping it would run `history foo --limit` with the default limit,
    * and `--name --ledger-dir DIR` would swallow `--ledger-dir` as the
    * name's value and lose the ledger dir. */
  private def parseArgs(args: List[String],
                        pos: List[String] = Nil,
                        flags: Map[String, String] = Map.empty)
      : Either[String, (List[String], Map[String, String])] = args match {
    case k :: v :: rest if k.startsWith("--") && !v.startsWith("--") =>
      parseArgs(rest, pos, flags + (k.stripPrefix("--") -> v))
    case k :: _ if k.startsWith("--") =>
      Left(s"flag $k requires a value")
    case a :: rest => parseArgs(rest, a :: pos, flags)
    case Nil => Right((pos.reverse, flags))
  }

  private def runCommand(spark: SparkSession, specPath: String,
                         flags: Map[String, String],
                         settings: GraftSettings): Int = {
    val p = java.nio.file.Paths.get(specPath)
    if (!java.nio.file.Files.exists(p)) {
      Console.err.println(s"spec file not found: $specPath")
      return 1
    }
    val specJson = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val name = flags.getOrElse("name",
      p.getFileName.toString.stripSuffix(".json"))
    // precedence: flag > environment (GraftSettings) > default
    val ledger = flags.get("ledger-dir").map(new RunLedger(_))
      .orElse(settings.runLedger)
    val ttl = flags.get("idempotency-ttl-days").map(_.toInt)
      .orElse(settings.idempotencyTtlDays)
    val idem =
      if (!settings.idempotencyEnabled) None // env kill-switch wins
      else flags.get("idempotency-dir").orElse(settings.idempotencyDir)
        .map(d => new IdempotencyLedger(d, ttlDays = ttl))
    try {
      val r = Pipeline.runJson(spark, specJson, ledger = idem,
        runLedger = ledger, pipelineName = name)
      if (r.skippedIdempotent) {
        Console.out.println(s"pipeline $name: SKIPPED (idempotency key already claimed)")
        return 0
      }
      Console.out.println(s"pipeline $name: OK")
      if (r.runId.nonEmpty) Console.out.println(s"run_id: ${r.runId}")
      r.stats.foreach(s => Console.out.println(
        f"  stage ${s.stage}%-15s ${s.durationMs}%6d ms" +
          (if (s.rows >= 0) f"  ${s.rows}%d rows" else "")))
      r.writeStats.foreach(w => Console.out.println(
        f"  write ${w.strategy}%-15s ${w.durationMs}%6d ms  ${w.rowsWritten}%d rows -> ${w.path}"))
      0
    } catch {
      case e: Exception =>
        Console.err.println(s"pipeline $name: FAILED — ${e.getMessage}")
        1
    }
  }

  private def withLedger(flags: Map[String, String],
                         settings: GraftSettings)
                        (f: String => Int): Int =
    flags.get("ledger-dir").orElse(settings.ledgerDir) match {
      case None =>
        Console.err.println("--ledger-dir (or GRAFT_LEDGER_DIR) is required"); 2
      case Some(dir) => f(dir)
    }

  private def statusCommand(spark: SparkSession, runId: String,
                            flags: Map[String, String],
                            settings: GraftSettings): Int =
    withLedger(flags, settings) { dir =>
      val rows = new RunLedger(dir).runs(spark)
        .where(org.apache.spark.sql.functions.col("run_id") === runId)
        .collect()
      if (rows.isEmpty) {
        Console.err.println(s"run not found: $runId")
        1
      } else {
        Console.out.println(s"run $runId (pipeline ${rows.head.getAs[String]("pipeline")}):")
        rows.foreach { r =>
          val stage = r.getAs[String]("stage")
          val base = f"  $stage%-15s ${r.getAs[Long]("duration_ms")}%6d ms"
          val detail =
            if (stage == "write")
              f"  ${r.getAs[Long]("rows")}%d rows (${r.getAs[String]("strategy")}) -> ${r.getAs[String]("output_path")}"
            else if (r.getAs[Long]("rows") >= 0) f"  ${r.getAs[Long]("rows")}%d rows"
            else ""
          Console.out.println(base + detail)
        }
        0
      }
    }

  private def historyCommand(spark: SparkSession, pipeline: String,
                             flags: Map[String, String],
                             settings: GraftSettings): Int =
    withLedger(flags, settings) { dir =>
      import org.apache.spark.sql.functions._
      val limit = flags.get("limit").map(_.toInt).getOrElse(20)
      // one line per run: newest first, stage count + write volume
      val rows = new RunLedger(dir).forPipeline(spark, pipeline)
        .groupBy("run_id")
        .agg(max("recorded_at").as("at"),
          count(lit(1)).as("n_stages"),
          sum(when(col("stage") === "write", col("rows"))
            .otherwise(lit(0L))).as("rows_written"))
        .orderBy(col("at").desc)
        .limit(limit)
        .collect()
      if (rows.isEmpty) {
        Console.err.println(s"no runs recorded for pipeline: $pipeline")
        1
      } else {
        Console.out.println(s"pipeline $pipeline — ${rows.length} most recent run(s):")
        rows.foreach(r => Console.out.println(
          f"  ${r.getAs[java.sql.Timestamp]("at")}  ${r.getAs[String]("run_id")}  " +
            f"stages=${r.getAs[Long]("n_stages")}%d rows_written=${r.getAs[Long]("rows_written")}%d"))
        0
      }
    }
}
