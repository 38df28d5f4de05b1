package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with decode / feature-extract / frame-sample stages.
  *
  * The Spark-side shape is the real deliverable: binary content rides as
  * a `binary` column with a typed metadata struct beside it; decode and
  * feature extraction run as `mapPartitions` over a typed Dataset so a
  * codec library is initialised once per partition (not per row) and the
  * batch shape (one partition = one codec context = many rows) survives
  * a 1000-executor deployment unchanged.
  *
  * The codec itself is a STUB — no image/audio libraries exist in this
  * environment — replaced by a deterministic fake (dimensions and
  * features derived from the id/bytes), clearly marked below. Swapping
  * in a real JNI/Java codec changes only the body of `fakeDecode`.
  */
object Multimodal {

  /** Typed metadata carried beside every binary payload. */
  case class MediaMeta(format: String, nBytes: Long, width: Long, height: Long)
  case class MediaRow(doc_id: Long, content: Array[Byte], meta: MediaMeta)
  case class FeatureRow(doc_id: Long, features: Array[Float])
  case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Attach binary content + metadata to a documents frame. The binary
    * column is the utf-8 payload of `text` here (the container has no
    * real media); schema and partition behavior are identical to real
    * image bytes. Fake format/dimensions are deterministic in doc_id. */
  def withMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        when(col("doc_id") % 3 === 0, "jpeg")
          .when(col("doc_id") % 3 === 1, "png")
          .otherwise("webp").as("format"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        (lit(64) + (col("doc_id") % 8) * 32).cast("long").as("width"),
        (lit(64) + (col("doc_id") % 5) * 48).cast("long").as("height")).as("meta"))

  /** STUB CODEC — deterministic fake decode. A real deployment replaces
    * this with an actual image decode (e.g. TwelveMonkeys/ImageIO via
    * JNI); everything around it (typed Dataset, mapPartitions batching,
    * fixed-width feature schema) is the real, tested plumbing. */
  private[operators] def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    var acc = 1469598103934665603L // FNV offset basis: stable, seedless
    while (i < content.length) {
      acc = (acc ^ content(i)) * 1099511628211L
      out(math.floorMod(acc, dim.toLong).toInt) += 1.0f
      i += 1
    }
    var j = 0
    val n = math.max(content.length, 1).toFloat
    while (j < dim) { out(j) /= n; j += 1 }
    out
  }

  /** Decode + feature-extract: one codec context per partition. */
  def extractFeatures(media: DataFrame, dim: Int = 32): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codec init would happen here, once per partition
        rows.map { case (id, bytes) => FeatureRow(id, fakeDecode(bytes, dim)) }
      }
  }

  /** Frame-sampling plumbing: split the payload into fixed-size frames
    * and emit every `stride`-th one (a video keyframe sampler's shape). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
                   stride: Int = 4): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % stride == 0 => FrameRow(id, idx, frame)
        }
      }
  }

  /** Resize plumbing: aspect-preserving fit into `maxSide`, metadata
    * recomputed exactly, payload re-emitted at the resampled size. The
    * geometry (target dims, stride sampling of the source buffer) is the
    * real, tested part; a real deployment swaps the byte resampler for
    * the codec's scaler alongside `fakeDecode`. Already-small media pass
    * through untouched — same rows, zero recompute. */
  def resize(media: DataFrame, maxSide: Long = 128): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"),
        col("meta.format"), col("meta.n_bytes"), col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], String, Long, Long, Long)]
      .mapPartitions { rows =>
        // real codec/scaler init would happen here, once per partition
        rows.map { case (id, bytes, fmt, _, w, h) =>
          val side = math.max(w, h)
          if (side <= maxSide) MediaRow(id, bytes, MediaMeta(fmt, bytes.length.toLong, w, h))
          else {
            val scale = maxSide.toDouble / side
            val (nw, nh) = (math.max(1L, math.round(w * scale)),
              math.max(1L, math.round(h * scale)))
            // STUB resampler: stride-sample the payload proportionally to
            // the area reduction (a real scaler maps pixels; the byte-
            // budget arithmetic and row shape are what the plan needs)
            val ratio = (nw.toDouble * nh) / (w.toDouble * h)
            val target = math.max(1, math.round(bytes.length * ratio).toInt)
            val out = new Array[Byte](target)
            var i = 0
            while (i < target) {
              out(i) = bytes(((i.toLong * bytes.length) / target).toInt)
              i += 1
            }
            MediaRow(id, out, MediaMeta(fmt, target.toLong, nw, nh))
          }
        }
      }
  }
}
