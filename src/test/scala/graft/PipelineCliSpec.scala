package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Drives the full CLI surface end-to-end on a temp warehouse:
  * `run <spec.json>` executes the pipeline and prints the ledger run id,
  * `status <run_id>` reads the recorded per-stage stats back, `history
  * <pipeline>` lists runs newest-first — the reference CLI's run/status
  * surface (src/cli/main.py:46,:213) re-expressed over the durable
  * RunLedger instead of a Celery result backend. */
class PipelineCliSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  /** Execute the CLI capturing stdout; returns (exitCode, stdout). */
  private def cli(args: String*): (Int, String) = cliEnv(Map.empty)(args: _*)

  /** [[cli]] with a synthetic GRAFT_* environment. */
  private def cliEnv(env: Map[String, String])(args: String*): (Int, String) = {
    val bos = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      PipelineCli.execute(spark, args.toArray, env)
    }
    (code, bos.toString("UTF-8"))
  }

  private def writeSpec(dir: String, in: String, out: String): String = {
    val spec =
      s"""{
         | "ingestion": {"path": "$in", "format": "parquet"},
         | "transformation": [
         |   {"type": "config", "config": {"filter": {"v": {">=": 5}}}}
         | ],
         | "persistence": {"path": "$out", "strategy": "append"}
         |}""".stripMargin
    val p = Paths.get(dir, "spec.json")
    Files.write(p, spec.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("run executes a spec file, prints stages + run id; status reads it back") {
    val dir = tmp("graft_cli")
    val in = s"$dir/in"
    (1L to 10L).map(i => (i, i)).toDF("id", "v")
      .write.parquet(in)
    val specPath = writeSpec(dir, in, s"$dir/out")
    val ledgerDir = s"$dir/ledger"

    val (code, outText) = cli("run", specPath, "--name", "clitest",
      "--ledger-dir", ledgerDir)
    assert(code == 0, outText)
    assert(outText.contains("pipeline clitest: OK"))
    assert(spark.read.parquet(s"$dir/out").count() == 6) // v in 5..10
    val runId = outText.linesIterator
      .find(_.startsWith("run_id: ")).get.stripPrefix("run_id: ").trim
    assert(runId.nonEmpty)

    val (sCode, sOut) = cli("status", runId, "--ledger-dir", ledgerDir)
    assert(sCode == 0, sOut)
    assert(sOut.contains(s"run $runId (pipeline clitest)"))
    assert(sOut.contains("ingestion") && sOut.contains("write"))
    assert(sOut.contains("6 rows")) // the write stage's recorded volume
  }

  test("run drives a spec-named code transform class (load-from-path parity)") {
    // reference code_transformer.py:164/:209: the spec names a
    // DataFrame=>DataFrame implementation the launching program never
    // registered; the stage resolves it from the session classpath.
    val dir = tmp("graft_cli_code")
    val in = s"$dir/in"
    (1L to 4L).map(i => (i, i)).toDF("id", "v").write.parquet(in)
    val spec =
      s"""{
         | "ingestion": {"path": "$in", "format": "parquet"},
         | "transformation": [
         |   {"type": "code", "class": "graft.DoubleVTransform", "name": "double_v"}
         | ],
         | "persistence": {"path": "$dir/out", "strategy": "append"}
         |}""".stripMargin
    val p = Paths.get(dir, "spec.json")
    Files.write(p, spec.getBytes(StandardCharsets.UTF_8))
    val (code, out) = cli("run", p.toString, "--name", "codecls",
      "--ledger-dir", s"$dir/ledger")
    assert(code == 0, out)
    assert(spark.read.parquet(s"$dir/out").select("v")
      .as[Long].collect().sorted.toSeq == Seq(2L, 4L, 6L, 8L))
    // a re-run reuses the idempotent registration and still succeeds
    val (code2, out2) = cli("run", p.toString, "--name", "codecls",
      "--ledger-dir", s"$dir/ledger")
    assert(code2 == 0, out2)
    assert(spark.read.parquet(s"$dir/out").count() == 8)
    // a typo'd class fails the run loudly, not silently (fresh registry
    // name — reusing "double_v" would hit the idempotent registration)
    val bad = spec.replace("graft.DoubleVTransform", "graft.NoSuchTransform")
      .replace("\"double_v\"", "\"double_v_bad\"")
    val pb = Paths.get(dir, "bad.json")
    Files.write(pb, bad.getBytes(StandardCharsets.UTF_8))
    val (codeB, _) = cli("run", pb.toString, "--name", "codecls-bad",
      "--ledger-dir", s"$dir/ledger")
    assert(codeB == 1, "a typo'd transform class must fail the run")
  }

  test("status on an unknown run id fails; missing --ledger-dir is a usage error") {
    val dir = tmp("graft_cli_status")
    // empty-but-existing ledger so the parquet read itself succeeds
    Seq(("seed", "seed", "seed", 0L, 0L, null: String, -1L, -1L, null: String))
      .toDF("run_id", "pipeline", "stage", "rows", "duration_ms",
        "strategy", "rows_inserted", "rows_updated", "output_path")
      .withColumn("recorded_at", org.apache.spark.sql.functions.current_timestamp())
      .write.parquet(s"$dir/ledger")
    assert(cli("status", "nope", "--ledger-dir", s"$dir/ledger")._1 == 1)
    assert(cli("status", "nope")._1 == 2)
    assert(cli("frobnicate")._1 == 2)
    assert(cli("run", s"$dir/does_not_exist.json")._1 == 1)
    // a flag with no value is a usage error, not a silent default:
    // dangling at the end of the args...
    assert(cli("history", "foo", "--ledger-dir", s"$dir/ledger", "--limit")._1 == 2)
    // ...or swallowing the next flag as its value
    assert(cli("status", "nope", "--name", "--ledger-dir", s"$dir/ledger")._1 == 2)
  }

  test("history lists a pipeline's runs newest-first and grows per run") {
    val dir = tmp("graft_cli_hist")
    val in = s"$dir/in"
    (1L to 10L).map(i => (i, i)).toDF("id", "v").write.parquet(in)
    val specPath = writeSpec(dir, in, s"$dir/out")
    val ledgerDir = s"$dir/ledger"
    val (c1, o1) = cli("run", specPath, "--name", "histtest", "--ledger-dir", ledgerDir)
    val (c2, o2) = cli("run", specPath, "--name", "histtest", "--ledger-dir", ledgerDir)
    assert(c1 == 0 && c2 == 0)
    val id1 = o1.linesIterator.find(_.startsWith("run_id: ")).get.stripPrefix("run_id: ").trim
    val id2 = o2.linesIterator.find(_.startsWith("run_id: ")).get.stripPrefix("run_id: ").trim
    val (hCode, hOut) = cli("history", "histtest", "--ledger-dir", ledgerDir)
    assert(hCode == 0, hOut)
    assert(hOut.contains("2 most recent run(s)"))
    assert(hOut.contains(id1) && hOut.contains(id2))
    // a pipeline with no runs is a lookup failure, not an empty success
    assert(cli("history", "ghost", "--ledger-dir", ledgerDir)._1 == 1)
  }

  test("structured stage log: one parseable JSON line per lifecycle event") {
    import graft.pipeline.StageLog
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val dir = tmp("graft_cli_log")
    val in = s"$dir/in"
    (1L to 10L).map(i => (i, i)).toDF("id", "v").write.parquet(in)
    val specPath = writeSpec(dir, in, s"$dir/out")
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val prev = StageLog.sink
    try {
      StageLog.sink = s => buf.synchronized { buf += s }
      val (c1, _) = cli("run", specPath, "--name", "logtest",
        "--idempotency-dir", s"$dir/keys")
      val (c2, _) = cli("run", specPath, "--name", "logtest",
        "--idempotency-dir", s"$dir/keys") // idempotent SKIP
      assert(c1 == 0 && c2 == 0)
    } finally StageLog.sink = prev
    val parsed = buf.toList.map(JsonMethods.parse(_))
    def events = parsed.map(j => (j \ "event") match { case JString(s) => s; case _ => "?" })
    assert(events == List("pipeline_start", "stage_complete", "stage_complete",
      "stage_complete", "pipeline_complete", "pipeline_skipped"), events)
    // every line carries the pipeline name and ONE consistent run id per run
    val runIds = parsed.take(5).map(j => (j \ "run_id") match { case JString(s) => s; case _ => "?" })
    assert(runIds.distinct.size == 1 && runIds.head.nonEmpty)
    assert(parsed.forall(j => (j \ "pipeline") == JString("logtest")))
    val complete = parsed(4)
    assert((complete \ "rows_written") == JInt(6))
    assert((complete \ "stages") == JInt(3))
    // escaping: hostile strings survive as one parseable line
    val hostile = StageLog.line("x", "msg" -> "a\"b\\c\nd\tef")
    assert((JsonMethods.parse(hostile) \ "msg") == JString("a\"b\\c\nd\tef"))
    // correlation id (reference logging.py contextvar): with no outer
    // context, every run line carries correlation_id == run_id
    val cids = parsed.take(5).map(j => (j \ "correlation_id") match { case JString(s) => s; case _ => "?" })
    assert(cids.distinct == List(runIds.head), cids)
  }

  test("correlation id: request-scoped context survives into every run's lines") {
    import graft.pipeline.{Pipeline, StageLog}
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val dir = tmp("graft_cid")
    val in = s"$dir/in"
    (1L to 10L).map(i => (i, i)).toDF("id", "v").write.parquet(in)
    val spec =
      s"""{"ingestion": {"path": "$in", "format": "parquet"},
         | "transformation": [{"type": "config", "config": {}}],
         | "persistence": {"path": "$dir/out", "strategy": "overwrite"}}""".stripMargin
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val prev = StageLog.sink
    val (r1, r2) = try {
      StageLog.sink = s => buf.synchronized { buf += s }
      // a scheduler submitting one REQUEST that spans two runs sets one
      // id around the batch: both runs' lines must carry it, while
      // their run_ids stay distinct
      StageLog.withCorrelationId("req-42") {
        (Pipeline.runJson(spark, spec, pipelineName = "cid_a"),
         Pipeline.runJson(spark, spec, pipelineName = "cid_b"))
      }
    } finally StageLog.sink = prev
    assert(r1.runId != r2.runId)
    val parsed = buf.toList.map(JsonMethods.parse(_))
    assert(parsed.nonEmpty)
    assert(parsed.forall(j => (j \ "correlation_id") == JString("req-42")),
      buf.mkString("\n"))
    // context restored after the scope: a fresh emit has no stale id
    assert(StageLog.correlationId.isEmpty)
    val bare = StageLog.line("x", "k" -> 1L)
    assert(!bare.contains("correlation_id"))
  }

  test("runnable example specs work from the repo root") {
    // the committed examples/ specs are the user's first contact with
    // the CLI — exercised here so they cannot silently rot
    val (c1, o1) = cli("run", "examples/pipeline_spec.json",
      "--name", "example", "--ledger-dir", "examples/out/ledger")
    assert(c1 == 0, o1)
    val basic = spark.read.parquet("examples/out/pipeline_result")
    assert(basic.columns.toSeq == Seq("doc_id", "source", "n_chars", "text"))
    assert(basic.where($"source" === "spam").count() == 0) // config filter
    assert(basic.count() == 11)
    val (c2, o2) = cli("run", "examples/training_prep_spec.json",
      "--name", "corpus-prep", "--ledger-dir", "examples/out/ledger")
    assert(c2 == 0, o2)
    val corpus = spark.read.parquet("examples/out/training_corpus")
    assert(corpus.columns.contains("quality_score") && corpus.columns.contains("split"))
    val ids = corpus.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(2L), "exact copy of doc 1 must be deduped")
    assert(!ids.contains(10L), "near-copy of doc 9 must be deduped")
    // history now shows both pipelines' runs
    val (c3, o3) = cli("history", "example", "--ledger-dir", "examples/out/ledger")
    assert(c3 == 0 && o3.contains("example"), o3)
  }

  test("idempotency dir makes a re-run a recorded SKIP, not a double write") {
    val dir = tmp("graft_cli_idem")
    val in = s"$dir/in"
    (1L to 10L).map(i => (i, i)).toDF("id", "v").write.parquet(in)
    val specPath = writeSpec(dir, in, s"$dir/out")
    val (c1, o1) = cli("run", specPath, "--name", "idem",
      "--idempotency-dir", s"$dir/keys")
    assert(c1 == 0 && o1.contains("idem: OK"), o1)
    val (c2, o2) = cli("run", specPath, "--name", "idem",
      "--idempotency-dir", s"$dir/keys")
    assert(c2 == 0 && o2.contains("SKIPPED"), o2)
    assert(spark.read.parquet(s"$dir/out").count() == 6) // written once
  }

  test("README retry/idempotency walkthrough: SKIP on re-run, flaky source retried") {
    // examples/README.md §5, exercised verbatim so it cannot rot
    // (reference examples/retry_idempotency_example.py)
    val idem = tmp("graft_cli_idem_example")
    val (c1, o1) = cli("run", "examples/pipeline_spec.json",
      "--name", "example-idem", "--ledger-dir", "examples/out/ledger",
      "--idempotency-dir", idem)
    assert(c1 == 0 && o1.contains("example-idem: OK"), o1)
    val (c2, o2) = cli("run", "examples/pipeline_spec.json",
      "--name", "example-idem", "--ledger-dir", "examples/out/ledger",
      "--idempotency-dir", idem)
    assert(c2 == 0 && o2.contains("SKIPPED (idempotency key already claimed)"), o2)
    // the README's flaky-source snippet (short delays for test speed)
    var attempts = 0
    val df = graft.pipeline.Retry.withBackoff(maxAttempts = 3, baseDelayMs = 1) {
      attempts += 1
      if (attempts < 3) throw new java.io.IOException("connection reset")
      spark.read.parquet("examples/out/pipeline_result")
    }
    assert(attempts == 3 && df.count() == 11)
    // the retryOn filter: a non-matching failure rethrows on attempt 1
    var tries = 0
    intercept[IllegalStateException] {
      graft.pipeline.Retry.withBackoff(maxAttempts = 3, baseDelayMs = 1,
        retryOn = { case _: java.io.IOException => true; case _ => false }) {
        tries += 1
        throw new IllegalStateException("not retryable")
      }
    }
    assert(tries == 1)
  }

  test("README logging walkthrough: correlation span across two runs, swappable sink, custom fields") {
    // examples/README.md §6, exercised verbatim so it cannot rot
    // (reference examples/logging_example.py)
    import graft.pipeline.{Pipeline, StageLog}
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val prev = StageLog.sink
    StageLog.sink = s => lines.synchronized { lines += s }
    try {
      val spec = java.nio.file.Files.readString(
        java.nio.file.Paths.get("examples/pipeline_spec.json"))
      StageLog.withCorrelationId("req-batch-42") {
        Pipeline.runJson(spark, spec, pipelineName = "log-example-a")
        Pipeline.runJson(spark, spec, pipelineName = "log-example-b")
      }
      // each run: pipeline_start, stage_complete x3 (ingestion/
      // transformation/persistence), pipeline_complete — one line per
      // STAGE, and every line carries the request-scoped id
      val captured = lines.synchronized(lines.toVector)
      assert(captured.size == 10, captured.mkString("\n"))
      assert(captured.forall(_.contains("\"correlation_id\": \"req-batch-42\"")),
        captured.mkString("\n"))
      def of(p: String) = captured.filter(_.contains(s""""pipeline": "$p""""))
      for (p <- Seq("log-example-a", "log-example-b")) {
        val ls = of(p)
        assert(ls.count(_.contains("\"event\": \"pipeline_start\"")) == 1, ls)
        assert(ls.count(_.contains("\"event\": \"stage_complete\"")) == 3, ls)
        assert(ls.count(_.contains("\"event\": \"pipeline_complete\"")) == 1, ls)
        assert(ls.exists(l => l.contains("\"stage\": \"persistence\"")
          && l.contains("\"rows\": 11")), ls)
      }
      // run_ids distinct across the two runs, same correlation id
      val rid = "\"run_id\": \"([0-9a-f-]+)\"".r
      val rids = captured.flatMap(l => rid.findFirstMatchIn(l).map(_.group(1))).toSet
      assert(rids.size == 2, rids)
      // custom events with custom fields pick up the context id and
      // JSON-typed scalars
      val n0 = captured.size
      StageLog.withCorrelationId("req-batch-42") {
        StageLog.emit("batch_scored",
          "batch" -> 1, "rows_in" -> 1000L, "rows_out" -> 950L,
          "duration_ms" -> 1234L)
      }
      val custom = lines.synchronized(lines.last)
      assert(lines.size == n0 + 1 &&
        custom.contains("\"event\": \"batch_scored\"") &&
        custom.contains("\"rows_in\": 1000") &&
        custom.contains("\"correlation_id\": \"req-batch-42\""), custom)
      // explicit correlation_id in fields WINS over the context (the
      // shared-pool emit-site guidance in §6)
      StageLog.withCorrelationId("stale-ctx") {
        StageLog.emit("pool_event", "correlation_id" -> "req-fresh")
      }
      assert(lines.synchronized(lines.last).contains("\"correlation_id\": \"req-fresh\""))
      // outside any span, no correlation id is stamped on ad-hoc emits
      StageLog.emit("bare_event")
      assert(!lines.synchronized(lines.last).contains("correlation_id"))
    } finally StageLog.sink = prev
  }

  test("GraftSettings: env alone configures the run; flags override env") {
    // reference settings.py:1-185 — every deployment knob is an env
    // variable with a default. The CLI must be fully drivable from
    // GRAFT_* env (no per-invocation flags), with flag > env > default.
    val dir = tmp("graft_cli_env")
    val in = s"$dir/in"
    (1L to 10L).map(i => (i, i)).toDF("id", "v").write.parquet(in)
    val specPath = writeSpec(dir, in, s"$dir/out")
    val env = Map(
      "GRAFT_LEDGER_DIR" -> s"$dir/ledger",
      "GRAFT_IDEMPOTENCY_DIR" -> s"$dir/keys")
    // 1. env alone: run records to the env ledger, claims the env key
    val (c1, o1) = cliEnv(env)("run", specPath, "--name", "envrun")
    assert(c1 == 0 && o1.contains("envrun: OK"), o1)
    val runId = o1.linesIterator
      .find(_.startsWith("run_id: ")).get.stripPrefix("run_id: ").trim
    // status/history read the env-configured ledger with no flags
    val (sc, so) = cliEnv(env)("status", runId)
    assert(sc == 0 && so.contains(s"run $runId"), so)
    // 2. the env idempotency dir suppresses the re-run
    val (c2, o2) = cliEnv(env)("run", specPath, "--name", "envrun")
    assert(c2 == 0 && o2.contains("SKIPPED"), o2)
    // 3. a FLAG overrides the env: a fresh idempotency dir runs again
    val (c3, o3) = cliEnv(env)("run", specPath, "--name", "envrun",
      "--idempotency-dir", s"$dir/keys2")
    assert(c3 == 0 && o3.contains("envrun: OK"), o3)
    // 4. the env kill-switch disables claiming even with a dir set
    val (c4, o4) = cliEnv(env + ("GRAFT_IDEMPOTENCY_ENABLED" -> "false"))(
      "run", specPath, "--name", "envrun")
    assert(c4 == 0 && o4.contains("envrun: OK"), o4)
  }

  test("single-stage subcommands: ingest/transform/persist chain via --input") {
    // reference cli/main.py:115/:147/:180 — one stage per invocation,
    // chained through materialized paths instead of Celery data_ids
    val dir = tmp("graft_cli_stage")
    val in = s"$dir/in"
    (1L to 10L).map(i => (i, i)).toDF("id", "v").write.parquet(in)
    val specPath = writeSpec(dir, in, s"$dir/out")
    val ledgerDir = s"$dir/ledger"

    // ingest alone: reads + counts the source, records to the ledger
    val (iCode, iOut) = cli("ingest", specPath, "--ledger-dir", ledgerDir)
    assert(iCode == 0, iOut)
    assert(iOut.contains("ingest spec-ingest: OK — 10 rows"), iOut)
    val runId = iOut.linesIterator
      .find(_.startsWith("run_id: ")).get.stripPrefix("run_id: ").trim
    val (sCode, sOut) = cli("status", runId, "--ledger-dir", ledgerDir)
    assert(sCode == 0 && sOut.contains("ingestion"), sOut)

    // transform on an explicit --input (the "previous stage's output")
    val (tCode, tOut) = cli("transform", specPath, "--input", in,
      "--ledger-dir", ledgerDir)
    assert(tCode == 0, tOut)
    assert(tOut.contains("transform spec-transform: OK — 6 rows"), tOut) // v >= 5

    // persist writes the --input through the spec's persistence block
    val (pCode, pOut) = cli("persist", specPath, "--input", in,
      "--ledger-dir", ledgerDir)
    assert(pCode == 0, pOut)
    assert(pOut.contains("persist spec-persist: OK"), pOut)
    assert(spark.read.parquet(s"$dir/out").count() == 10) // unfiltered input
    // stage-block validation fails loudly, not silently no-ops
    val bare = Paths.get(dir, "bare.json")
    Files.write(bare,
      s"""{"ingestion": {"path": "$in", "format": "parquet"}}"""
        .getBytes(StandardCharsets.UTF_8))
    assert(cli("transform", bare.toString)._1 == 1)
    assert(cli("persist", bare.toString)._1 == 1)
    assert(cli("ingest", s"$dir/none.json")._1 == 1)
  }

  test("documented chained walkthrough: ingest --output -> transform -> persist == one-shot run") {
    // examples/README.md §4 verbatim: the staged chain over materialized
    // paths must reproduce the one-shot `run` bit-for-bit (the committed
    // spec's persistence strategy is `replace`)
    val ledgerDir = tmp("graft_cli_chain_ledger")
    val (rc, ro) = cli("run", "examples/pipeline_spec.json",
      "--name", "oneshot", "--ledger-dir", ledgerDir)
    assert(rc == 0, ro)
    val oneShot = spark.read.parquet("examples/out/pipeline_result")
      .collect().map(_.toString).sorted.toSeq

    val (c1, o1) = cli("ingest", "examples/pipeline_spec.json",
      "--output", "examples/out/stage_ingested", "--ledger-dir", ledgerDir)
    assert(c1 == 0 && o1.contains("-> examples/out/stage_ingested"), o1)
    val (c2, o2) = cli("transform", "examples/pipeline_spec.json",
      "--input", "examples/out/stage_ingested",
      "--output", "examples/out/stage_transformed", "--ledger-dir", ledgerDir)
    assert(c2 == 0 && o2.contains("-> examples/out/stage_transformed"), o2)
    val (c3, o3) = cli("persist", "examples/pipeline_spec.json",
      "--input", "examples/out/stage_transformed", "--ledger-dir", ledgerDir)
    assert(c3 == 0, o3)

    val chained = spark.read.parquet("examples/out/pipeline_result")
      .collect().map(_.toString).sorted.toSeq
    assert(chained == oneShot, "staged chain diverged from the one-shot run")
    // each stage recorded its own ledger row
    val (hc, ho) = cli("history", "pipeline_spec-ingest", "--ledger-dir", ledgerDir)
    assert(hc == 0 && ho.contains("pipeline_spec-ingest"), ho)
  }

  test("health subcommand probes the spec's source without running it") {
    val dir = tmp("graft_cli_health")
    val in = s"$dir/in"
    (1L to 3L).map(i => (i, i)).toDF("id", "v").write.parquet(in)
    val specPath = writeSpec(dir, in, s"$dir/out")
    val (hCode, hOut) = cli("health", specPath)
    assert(hCode == 0 && hOut.contains("HEALTHY"), hOut)
    // nothing was executed: no output written
    assert(!Files.exists(Paths.get(s"$dir/out")))
    // a dead path source is unhealthy (fast retries via env override)
    val deadSpec = Paths.get(dir, "dead.json")
    Files.write(deadSpec,
      s"""{"ingestion": {"path": "$dir/missing", "format": "parquet"}}"""
        .getBytes(StandardCharsets.UTF_8))
    val (dCode, _) = cliEnv(Map("GRAFT_MAX_RETRIES" -> "1"))(
      "health", deadSpec.toString)
    assert(dCode == 1)
    // a JDBC url source routes through the retrying probe, and the
    // printed identity is credential-sanitized
    val db = s"$dir/derbydb"
    val jdbcSpec = Paths.get(dir, "jdbc.json")
    Files.write(jdbcSpec,
      s"""{"ingestion": {"url": "jdbc:derby:$db;create=true;user=u;password=sekret",
         |  "table": "t", "probe_sql": "VALUES 1"}}""".stripMargin
        .getBytes(StandardCharsets.UTF_8))
    val (jCode, jOut) = cli("health", jdbcSpec.toString)
    assert(jCode == 0 && jOut.contains("HEALTHY"), jOut)
    assert(!jOut.contains("sekret"), jOut)
  }

  test("workers subcommand lists the live executor inventory") {
    // reference cli/main.py:265 workers_command: count + per-worker
    // active tasks + pool; Spark analog reads the StatusTracker. In
    // local mode the inventory is exactly the driver executor.
    val (code, out) = cli("workers")
    assert(code == 0, out)
    assert(out.contains("Found 1 executor(s)"), out)
    assert(out.contains(s"pool: ${spark.sparkContext.master}"), out)
    assert(out.contains("Active tasks:"), out)
    assert(out.contains("Storage memory:"), out)
    // flags are tolerated but ignored; extra positionals are a usage error
    assert(cli("workers", "extra")._1 == 2)
  }

  test("workers health view: per-executor failed-task counts and unhealthy flag") {
    // reference api/main.py:441 get_workers_health: failure detail on
    // top of the inventory. Provoke exactly one task failure (local
    // mode has maxFailures=1, so one single-partition job = one failed
    // task), then the health section must show it against "driver".
    intercept[org.apache.spark.SparkException] {
      spark.sparkContext.parallelize(Seq(1), 1)
        .foreach(_ => throw new RuntimeException("boom"))
    }
    // the listener bus is async — wait for the failure to land
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (graft.pipeline.WorkerHealth.snapshot(spark.sparkContext).get("driver")
             .forall(_.failed < 1) && System.nanoTime() < deadline)
      Thread.sleep(20)
    val (code, out) = cli("workers")
    assert(code == 0, out)
    assert(out.contains("Health (task outcomes since session start):"), out)
    val driverLine = out.linesIterator
      .find(_.trim.startsWith("Executor driver:")).getOrElse(fail(out))
    val failed = "(\\d+) failed".r.findFirstMatchIn(driverLine)
      .map(_.group(1).toLong).getOrElse(fail(driverLine))
    assert(failed >= 1L, driverLine)
    assert(driverLine.contains("[healthy]") || driverLine.contains("[UNHEALTHY]"))
    // the unhealthy rule itself, pinned: removal or failures >= successes
    import graft.pipeline.WorkerHealth.ExecutorHealth
    assert(!ExecutorHealth().unhealthy)                      // idle executor
    assert(!ExecutorHealth(failed = 1, succeeded = 100).unhealthy) // one flake
    assert(ExecutorHealth(failed = 3, succeeded = 2).unhealthy)
    assert(ExecutorHealth(failed = 1, succeeded = 0).unhealthy)
    assert(ExecutorHealth(removed = true, removeReason = "lost").unhealthy)
  }

  test("GraftSettings: malformed env values fail loudly, never default silently") {
    val bad = Map("GRAFT_IDEMPOTENCY_TTL_DAYS" -> "soon")
    val (code, _) = cliEnv(bad)("history", "whatever")
    assert(code == 2)
    intercept[IllegalArgumentException] {
      graft.pipeline.GraftSettings.fromEnv(Map("GRAFT_LOG_LEVEL" -> "CHATTY"))
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.GraftSettings.fromEnv(Map("GRAFT_RETRY_BACKOFF" -> "x2"))
    }
    // valid values parse with documented precedence over defaults
    val s = graft.pipeline.GraftSettings.fromEnv(Map(
      "GRAFT_IDEMPOTENCY_TTL_DAYS" -> "7",
      "GRAFT_MAX_RETRIES" -> "5",
      "GRAFT_LOG_LEVEL" -> "info"))
    assert(s.idempotencyTtlDays.contains(7) && s.maxRetries == 5
      && s.logLevel == "INFO")
    val d = graft.pipeline.GraftSettings.fromEnv(Map.empty)
    assert(d == graft.pipeline.GraftSettings.defaults)
  }
}
