package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Codec-free media corruption/quality screen: planted damage is
  * recovered flag-exactly, clean payloads pass, and every flag is a pure
  * function of the reported measurements. */
class MediaScreenSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, String)*) =
    Multimodal.withMedia(rows.toDF("doc_id", "text"))

  test("planted corruption is recovered flag-exactly; clean rows pass") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val screened = Multimodal.screenMedia(
        Multimodal.withCorruptPayloads(Multimodal.withMedia(docs), every = 7),
        minDistinctBytes = 2)
      .collect()
    screened.foreach { r =>
      if (r.doc_id % 7 == 0 && r.n_bytes_meta > 0) {
        ((r.doc_id / 7) % 3) match {
          case 0 => assert(r.truncated && !r.is_empty,
            s"doc ${r.doc_id} should screen as truncated")
          case 1 => assert(r.is_empty && r.truncated,
            s"doc ${r.doc_id} should screen as a dead fetch")
          case _ => assert(r.low_entropy && r.distinct_bytes == 1,
            s"doc ${r.doc_id} should screen as constant-fill")
        }
        assert(!r.ok)
      } else {
        // clean payloads: actual bytes match the declared metadata and
        // text payloads clear the 2-distinct-bytes bar
        assert(r.n_bytes_actual == r.n_bytes_meta)
        assert(r.ok, s"clean doc ${r.doc_id} unexpectedly flagged")
      }
    }
    assert(screened.exists(!_.ok) && screened.exists(_.ok))
  }

  test("every flag is a pure function of the reported measurements") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(200)
    Multimodal.screenMedia(
        Multimodal.withCorruptPayloads(Multimodal.withMedia(docs)),
        maxBytes = 600, maxPixels = 40000, minDistinctBytes = 8)
      .collect().foreach { r =>
        assert(r.is_empty == (r.n_bytes_actual == 0))
        assert(r.truncated == (r.n_bytes_actual < r.n_bytes_meta))
        assert(r.oversize == (r.n_bytes_actual > 600))
        assert(r.geometry_bad == (r.width * r.height > 40000))
        assert(r.low_entropy == (!r.is_empty && r.distinct_bytes < 8))
        assert(r.ok == !(r.is_empty || r.truncated || r.oversize ||
          r.format_unknown || r.geometry_bad || r.low_entropy))
      }
  }

  test("byte-budget, pixel-budget, and format allow-list gates fire") {
    val m = media((1L, "x" * 150), (2L, "ab" * 30))
    // 1 (96x112 = 10752 px, 150 constant bytes): oversize at a 100-byte
    // budget AND constant-fill; 2 (128x160 = 20480 px, 60 bytes): within
    // the byte budget but over a 15k-pixel budget
    val out = Multimodal.screenMedia(m, maxBytes = 100, maxPixels = 15000)
      .collect().sortBy(_.doc_id)
    assert(out(0).oversize && out(0).low_entropy && !out(0).ok)
    assert(!out(1).oversize && out(1).geometry_bad && !out(1).ok)
    // format allow-list: jpeg-only screening flags the png/webp rows
    val fmts = Multimodal.screenMedia(media((3L, "hello there world"),
        (4L, "second doc body"), (5L, "third doc body")),
        allowedFormats = Seq("jpeg"))
      .collect().sortBy(_.doc_id)
    fmts.foreach(r => assert(r.format_unknown == (r.format != "jpeg")))
  }

  test("streaming media-screen ingest: survivors to corpus, flagged rows to quarantine, replay idempotent") {
    import graft.streaming.EventStream
    val base = java.nio.file.Files.createTempDirectory("graft_screen_ingest").toString
    val m = Multimodal.withCorruptPayloads(
      media((7L, "a clean payload body here"), (14L, "another clean one"),
        (21L, "third body of text")),
      every = 7)
    // ids 7/14/21 damaged per (id/7)%3: 14 -> truncated? (14/7)%3=2 ->
    // constant-fill; 7 -> (1)%3=1 empty; 21 -> (3)%3=0 truncated
    EventStream.mediaScreenIngestBatch(m, 0L, s"$base/corpus", s"$base/quar",
      1L << 20, 1L << 22, Seq("jpeg", "png", "webp"), 2)
    EventStream.mediaScreenIngestBatch(m, 0L, s"$base/corpus", s"$base/quar",
      1L << 20, 1L << 22, Seq("jpeg", "png", "webp"), 2)
    val quar = spark.read.parquet(s"$base/quar")
    assert(quar.select("doc_id").as[Long].collect().toSet == Set(7L, 14L, 21L))
    assert(quar.where(col("doc_id") === 7 && col("is_empty")).count() == 1)
    assert(quar.where(col("doc_id") === 14 && col("low_entropy")).count() == 1)
    assert(quar.where(col("doc_id") === 21 && col("truncated")).count() == 1)
    // nothing admitted (all three rows planted-corrupt), no replay dups
    val fsCorpus = new java.io.File(s"$base/corpus/__batch_id=0")
    assert(!fsCorpus.exists() || spark.read.parquet(s"$base/corpus").count() == 0)
    // a second batch with a clean row is admitted beside the quarantine
    EventStream.mediaScreenIngestBatch(
      media((2L, "perfectly fine document")), 1L, s"$base/corpus", s"$base/quar",
      1L << 20, 1L << 22, Seq("jpeg", "png", "webp"), 2)
    assert(spark.read.parquet(s"$base/corpus")
      .select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }
}
