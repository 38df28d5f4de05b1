package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Cdc
import graft.streaming.EventStream

/** Streaming composition-drift monitoring against a stored reference
  * profile: agreement with the batch drift operator, dimension-set
  * safety, replay idempotency, and the end-to-end MemoryStream path. */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val dims = Seq(
    "lang" -> col("lang"),
    "source" -> col("source"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_drift_$tag").toString

  test("driftAgainstReference agrees with the batch drift operator") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val ref = docs.where(col("doc_id") % 5 =!= 4)
    val batch = docs.where(col("doc_id") % 5 =!= 0)
    val dir = tmp("agree")
    Cdc.buildDriftReference(ref, dims, dir)
    val viaProfile = Cdc.driftAgainstReference(batch, dims, dir)
      .select("dim", "cell", "share_ref", "share_batch", "drift")
      .as[(String, String, Double, Double, Double)].collect().sorted.toSeq
    val direct = Cdc.distributionDrift(ref, batch, dims)
      .select("dim", "cell", "share_old", "share_new", "drift")
      .as[(String, String, Double, Double, Double)].collect().sorted.toSeq
    assert(viaProfile.nonEmpty && viaProfile == direct)
  }

  test("a profile refuses mismatched monitor dimensions") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val dir = tmp("dims")
    Cdc.buildDriftReference(docs, dims, dir)
    val ex = intercept[IllegalArgumentException] {
      Cdc.driftAgainstReference(docs, Seq("lang" -> col("lang")), dir)
    }
    assert(ex.getMessage.contains("lang"))
  }

  test("monitor batch replay is idempotent and vanished cells surface with a zero side") {
    val refDir = tmp("replay_ref")
    val outDir = tmp("replay_out")
    Cdc.buildDriftReference(
      Seq(("en", "a"), ("en", "b"), ("de", "a")).toDF("lang", "source"),
      dims, refDir)
    // the batch has no 'de' rows and introduces source 'c'
    val batch = Seq(("en", "a"), ("en", "c")).toDF("lang", "source")
    EventStream.driftMonitorBatch(batch, 0L, dims, refDir, outDir)
    EventStream.driftMonitorBatch(batch, 0L, dims, refDir, outDir)
    val out = spark.read.parquet(outDir)
    assert(out.select("__batch_id").distinct().count() == 1)
    val rows = out.select("dim", "cell", "n_ref", "n_batch")
      .as[(String, String, Long, Long)].collect().toSet
    assert(rows.contains(("lang", "de", 1L, 0L)))   // vanished from the batch
    assert(rows.contains(("source", "c", 0L, 1L))) // unseen by the reference
    // per-dim batch shares sum to 1 at 6dp
    val sums = out.groupBy("dim").agg(round(sum("share_batch"), 4).as("s"))
      .select("s").as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-3))
  }

  test("streaming drift monitor over a MemoryStream reports per-batch composition") {
    implicit val sqlCtx = spark.sqlContext
    val refDir = tmp("stream_ref")
    val outDir = tmp("stream_out")
    Cdc.buildDriftReference(
      Seq(("en", "a"), ("fr", "b")).toDF("lang", "source"), dims, refDir)
    val mem = MemoryStream[(String, String)]
    val q = EventStream.driftMonitorSink(mem.toDF().toDF("lang", "source"),
      dims, refDir, outDir, tmp("ckpt")).start()
    try {
      mem.addData(("en", "a"), ("en", "a")) // all-en batch: fr drifted away
      q.processAllAvailable()
      mem.addData(("fr", "b"))
      q.processAllAvailable()
      val b0 = spark.read.parquet(outDir).where(col("__batch_id") === 0)
        .select("dim", "cell", "share_ref", "share_batch")
        .as[(String, String, Double, Double)].collect().toSet
      assert(b0.contains(("lang", "en", 0.5, 1.0)))
      assert(b0.contains(("lang", "fr", 0.5, 0.0)))
      val b1 = spark.read.parquet(outDir).where(col("__batch_id") === 1)
        .select("dim", "cell", "share_batch")
        .as[(String, String, Double)].collect().toSet
      assert(b1.contains(("lang", "fr", 1.0)))
    } finally q.stop()
  }
}
