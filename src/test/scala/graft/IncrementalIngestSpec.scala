package graft

import java.nio.file.Files

import graft.pipeline.DurableRegistry
import graft.sources.IncrementalIngestor

/** High-watermark incremental ingestion: only new rows per run, durable
  * crash-safe marks, pushdown-filtered increments. */
class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("incremental ingest reads only rows past the committed watermark") {
    val dir = Files.createTempDirectory("graft_incr").toString
    val table = s"$dir/tbl"
    val reg = new DurableRegistry(s"$dir/reg")
    val inc = new IncrementalIngestor(reg, "events_src")

    Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("id", "seq")
      .write.mode("append").parquet(table)

    // run 1: everything; commit mark=300
    val run1 = inc.readIncrement(spark, table, "seq")
    assert(run1.count() == 3)
    assert(inc.commit(run1, "seq", "run1").contains("300"))

    // new data lands; run 2 sees ONLY the new tail
    Seq((4L, 400L), (5L, 500L)).toDF("id", "seq")
      .write.mode("append").parquet(table)
    val run2 = inc.readIncrement(spark, table, "seq")
    assert(run2.select("id").as[Long].collect().toSet == Set(4L, 5L))
    // the watermark predicate reaches the parquet scan
    val scan = run2.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan"),
      s"watermark filter must push down:\n$scan")
    assert(inc.commit(run2, "seq", "run2").contains("500"))

    // idle run: empty increment, no mark committed, history intact
    val run3 = inc.readIncrement(spark, table, "seq")
    assert(run3.isEmpty)
    assert(inc.commit(run3, "seq").isEmpty)
    assert(inc.history() == Seq((1, "300"), (2, "500")))

    // a fresh ingestor over the same registry resumes from the mark
    val resumed = new IncrementalIngestor(new DurableRegistry(s"$dir/reg"), "events_src")
    assert(resumed.lastWatermark().contains("500"))
  }

  test("pipeline spec with incremental ingestion processes only new rows per run") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_incr_pipe").toString
    val table = s"$dir/src"
    val out = s"$dir/out"
    Seq((1L, 10L), (2L, 20L)).toDF("id", "seq")
      .write.mode("append").parquet(table)
    val spec =
      s"""{
         | "ingestion": {"path": "$table",
         |   "incremental": {"watermark_column": "seq",
         |     "registry_dir": "$dir/reg", "source_name": "src"}},
         | "persistence": {"path": "$out", "strategy": "append"}
         |}""".stripMargin
    val r1 = graft.pipeline.Pipeline.runJson(spark, spec, pipelineName = "incr")
    assert(r1.writeStats.exists(_.rowsWritten == 2))
    // second run with no new data appends nothing
    val r2 = graft.pipeline.Pipeline.runJson(spark, spec, pipelineName = "incr")
    assert(r2.writeStats.exists(_.rowsWritten == 0))
    // new rows land; third run appends only those
    Seq((3L, 30L)).toDF("id", "seq").write.mode("append").parquet(table)
    val r3 = graft.pipeline.Pipeline.runJson(spark, spec, pipelineName = "incr")
    assert(r3.writeStats.exists(_.rowsWritten == 1))
    assert(spark.read.parquet(out).count() == 3)
    // marks committed per successful run that had data
    val reg = new DurableRegistry(s"$dir/reg")
    assert(reg.history("src").map(_._1) == Seq(1, 2))
  }
}
