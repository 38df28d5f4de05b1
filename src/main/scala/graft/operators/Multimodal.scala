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
  /** Result of a REAL decode: dimensions read from the pixels plus a
    * fixed-width feature vector; `ok=false` rows carry the fallback for
    * payloads the codec could not parse (corrupt/unknown format). */
  case class DecodedRow(doc_id: Long, ok: Boolean, width: Long, height: Long,
                        features: Array[Float])

  /** Aspect-preserving fit of (w,h) into `maxSide` — the ONE geometry
    * used by both the stub resampler and the real imageio scaler, so the
    * spec that pins the math covers both paths. */
  def fitDims(w: Long, h: Long, maxSide: Long): (Long, Long) = {
    val side = math.max(w, h)
    if (side <= maxSide) (w, h)
    else {
      val scale = maxSide.toDouble / side
      (math.max(1L, math.round(w * scale)), math.max(1L, math.round(h * scale)))
    }
  }

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

  /** Deterministic planted near-dup fixture: every `every`-th payload
    * gains a REPLICA row (`doc_id + idOffset`) whose bytes carry a small
    * in-place edit confined to ONE byte-grid cell (the slice one 8×9
    * cell averages), so the replica sits within hamming ≤2 of its
    * original by construction — the corpus-shaped ground truth the
    * rows-only `multimodal_dhash` entry and its spec recover. Same-LENGTH
    * edits only: the byte grid (like real dHash under crops) is robust to
    * in-place edits, not length-shifting ones. Scales linearly — one
    * typed flatMap, no shuffle, replica volume = corpus/`every`. */
  def withNearDupReplicas(media: DataFrame, every: Int = 5,
                          idOffset: Long = 1000000000L): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"),
        col("meta.format"), col("meta.n_bytes"), col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], String, Long, Long, Long)]
      .flatMap { case (id, bytes, fmt, nb, w, h) =>
        val orig = MediaRow(id, bytes, MediaMeta(fmt, nb, w, h))
        if (id % every != 0 || bytes.length == 0) Seq(orig)
        else {
          val out = bytes.clone()
          // overwrite the slice cell #10 averages (row 1, col 1): the
          // edit lands entirely inside one grid cell, flipping at most
          // the two comparisons that cell participates in
          val n = out.length
          var i = (10L * n / 72).toInt
          val to = (11L * n / 72).toInt
          while (i < to) { out(i) = 'z'.toByte; i += 1 }
          Seq(orig, MediaRow(id + idOffset, out, MediaMeta(fmt, nb, w, h)))
        }
      }
      .toDF()
      .select(col("doc_id"), col("content"),
        struct(col("meta.format").as("format"), col("meta.nBytes").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height")).as("meta"))
  }

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
          val (nw, nh) = fitDims(w, h, maxSide)
          if (nw == w && nh == h)
            MediaRow(id, bytes, MediaMeta(fmt, bytes.length.toLong, w, h))
          else {
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

  /** Per-payload corruption/quality screen row: every flag an ingest
    * gate filters on, plus the raw measurements behind them so audits
    * can re-threshold without rescanning payloads. */
  case class ScreenRow(doc_id: Long, format: String,
                       n_bytes_meta: Long, n_bytes_actual: Long,
                       width: Long, height: Long,
                       distinct_bytes: Int,
                       is_empty: Boolean, truncated: Boolean,
                       oversize: Boolean, format_unknown: Boolean,
                       geometry_bad: Boolean, low_entropy: Boolean,
                       ok: Boolean)

  /** Media corruption/quality screen — the multimodal counterpart of the
    * text quality gate: one typed pass over (payload, metadata) emitting
    * per-row flags and the measurements behind them. Catches the failure
    * modes a crawl's media actually arrives with:
    *  - `is_empty`        zero-byte payload (dead fetch);
    *  - `truncated`       actual bytes < declared `meta.n_bytes` (a cut
    *                      transfer — the #1 corrupt-image mode at crawl
    *                      scale: the container is valid up to the cut);
    *  - `oversize`        payload over the byte budget (decode-bomb
    *                      guard: cap BEFORE any codec touches it);
    *  - `format_unknown`  declared format outside the allow-list;
    *  - `geometry_bad`    non-positive or budget-exceeding declared
    *                      pixel dimensions (allocation guard — width x
    *                      height is what the decoder will malloc);
    *  - `low_entropy`     fewer distinct byte values than a plausible
    *                      compressed image has (constant-fill / dead
    *                      sensor / placeholder payloads; real JPEG/PNG
    *                      streams are near-uniform in byte histogram).
    * `ok` = none of the above. For payloads that really are images, the
    * imageio path ([[decodeImages]]'s `ok` flag) adds a true parse
    * check downstream of this screen; the screen itself never runs a
    * codec, which is exactly why it is safe to run FIRST on untrusted
    * bytes.
    *
    * Scale shape: embarrassingly parallel — one scan, no shuffle, no
    * codec; the byte histogram is a 256-int array per task. Flags land
    * beside the measurements so the gate (`where ok`) and the audit
    * (`groupBy` flags) both run off this one pass. */
  def screenMedia(media: DataFrame, maxBytes: Long = 1L << 20,
                  maxPixels: Long = 1L << 22,
                  allowedFormats: Seq[String] = Seq("jpeg", "png", "webp"),
                  minDistinctBytes: Int = 8): Dataset[ScreenRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    val allowed = allowedFormats.toSet
    media.select(col("doc_id"), col("content"),
        col("meta.format"), col("meta.n_bytes"), col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], String, Long, Long, Long)]
      .mapPartitions { rows =>
        val seen = new Array[Boolean](256)
        rows.map { case (id, bytes, fmt, nbMeta, w, h) =>
          java.util.Arrays.fill(seen, false)
          var distinct = 0
          var i = 0
          val n = if (bytes == null) 0 else bytes.length
          while (i < n) {
            val b = bytes(i) & 0xff
            if (!seen(b)) { seen(b) = true; distinct += 1 }
            i += 1
          }
          val isEmpty = n == 0
          val truncated = n < nbMeta
          val oversize = n > maxBytes
          val formatUnknown = !allowed.contains(fmt)
          val geometryBad = w <= 0 || h <= 0 || w * h > maxPixels
          // an empty payload is already flagged; don't double-count it
          val lowEntropy = !isEmpty && distinct < minDistinctBytes
          ScreenRow(id, fmt, nbMeta, n.toLong, w, h, distinct,
            isEmpty, truncated, oversize, formatUnknown, geometryBad,
            lowEntropy,
            ok = !(isEmpty || truncated || oversize || formatUnknown ||
              geometryBad || lowEntropy))
        }
      }
  }

  /** Deterministic planted-corruption fixture for [[screenMedia]]'s
    * spec and the corpus-shaped query: every `every`-th payload is
    * damaged in one of three ways by id (truncate to half the declared
    * bytes / empty / constant-fill), metadata left claiming the
    * original — exactly the mismatch shapes a cut transfer, dead fetch,
    * and placeholder payload produce. Other rows pass through
    * untouched. One typed map, no shuffle. */
  def withCorruptPayloads(media: DataFrame, every: Int = 7): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"),
        col("meta.format"), col("meta.n_bytes"), col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], String, Long, Long, Long)]
      .map { case (id, bytes, fmt, nb, w, h) =>
        val out =
          if (id % every != 0 || bytes.length == 0) bytes
          else (id / every) % 3 match {
            case 0 => bytes.take(math.max(1, bytes.length / 2)) // truncated
            case 1 => Array.empty[Byte]                         // dead fetch
            case _ => Array.fill(bytes.length)('x'.toByte)      // placeholder
          }
        MediaRow(id, out, MediaMeta(fmt, nb, w, h))
      }
      .toDF()
      .select(col("doc_id"), col("content"),
        struct(col("meta.format").as("format"), col("meta.nBytes").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height")).as("meta"))
  }

  // ---------------------------------------------------------------------
  // REAL codec path: JDK javax.imageio (PNG/JPEG/BMP/GIF) — no external
  // libraries. Used for payloads that actually ARE images; the fake codec
  // above stays for deterministic specs over synthetic (text) payloads.
  // ---------------------------------------------------------------------

  /** Decode one payload with imageio. Returns None for bytes that are
    * not a parseable image (ImageIO.read yields null) — callers emit a
    * quarantine-style ok=false row instead of failing the task. */
  private[operators] def imageioDecode(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }
  }

  /** Fixed-width feature vector from decoded pixels: a `dim`-bucket
    * luminance histogram (L1-normalised). Pixels are sampled on a stride
    * so the per-row cost is bounded by ~`maxSamples` regardless of the
    * source resolution — a 100-megapixel scan costs the same as a
    * thumbnail, which is what keeps task times uniform at scale. */
  private[operators] def luminanceHistogram(
      img: java.awt.image.BufferedImage, dim: Int,
      maxSamples: Int = 4096): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val total = w.toLong * h
    val stride = math.max(1L, total / maxSamples)
    val out = new Array[Float](dim)
    var idx = 0L
    var n = 0
    while (idx < total) {
      val rgb = img.getRGB((idx % w).toInt, (idx / w).toInt)
      val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      out(math.min(dim - 1, (lum / 256.0 * dim).toInt)) += 1.0f
      n += 1
      idx += stride
    }
    var j = 0
    while (j < dim) { out(j) /= math.max(n, 1); j += 1 }
    out
  }

  /** REAL decode + feature-extract over image payloads. Same partition
    * batching as [[extractFeatures]]: the codec context (imageio's
    * in-memory cache mode) is configured once per partition, then every
    * row in the partition reuses it. Undecodable payloads become
    * ok=false rows with the zero vector — decode failures are data, not
    * task failures (one corrupt file must not kill a 100 TB stage). */
  def decodeImages(media: DataFrame, dim: Int = 32): Dataset[DecodedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init: no temp-file cache on executors
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          imageioDecode(bytes) match {
            case Some(img) => DecodedRow(id, ok = true, img.getWidth.toLong,
              img.getHeight.toLong, luminanceHistogram(img, dim))
            case None => DecodedRow(id, ok = false, 0L, 0L, new Array[Float](dim))
          }
        }
      }
  }

  // ---------------------------------------------------------------------
  // Perceptual near-dup: dHash fingerprints + hamming block buckets —
  // the dedup × multimodal intersection (image near-dup at corpus scale).
  // ---------------------------------------------------------------------

  /** 64-bit difference hash from an 8-row × 9-column luminance grid:
    * bit r*8+c set when grid(r)(c+1) > grid(r)(c) — the standard dHash
    * layout (horizontal gradient signs survive rescaling/re-encoding,
    * which is what makes it perceptual rather than byte-exact). */
  private[operators] def dHashFromGrid(grid: Array[Array[Double]]): Long = {
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r)(c + 1) > grid(r)(c)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Deterministic 8×9 grid for NON-image payloads (the stub-codec
    * path): cell = mean unsigned byte over the payload slice it covers,
    * laid out row-major — a 1D box resample, locality-preserving like a
    * real downscale: a small payload edit moves a few cells, not the
    * whole grid, so near-identical payloads land within hamming reach
    * (an avalanche hash here would scatter them uselessly). */
  private[operators] def byteGrid(bytes: Array[Byte]): Array[Array[Double]] = {
    val cells = 72
    val out = Array.ofDim[Double](8, 9)
    val n = bytes.length
    var i = 0
    while (i < cells) {
      val from = (i.toLong * n / cells).toInt
      val to = ((i + 1).toLong * n / cells).toInt
      var s = 0.0
      var j = from
      while (j < to) { s += bytes(j) & 0xff; j += 1 }
      out(i / 9)(i % 9) = if (to > from) s / (to - from) else 0.0
      i += 1
    }
    out
  }

  /** 8×9 luminance grid from a REAL decoded image: one centre-sampled
    * pixel per grid box — O(72) per image regardless of resolution, and
    * stable under rescaling because box centres map to the same image
    * regions at any size. */
  private[operators] def luminanceGrid(
      img: java.awt.image.BufferedImage): Array[Array[Double]] = {
    val out = Array.ofDim[Double](8, 9)
    val w = img.getWidth
    val h = img.getHeight
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        val x = math.min(w - 1, ((c + 0.5) * w / 9).toInt)
        val y = math.min(h - 1, ((r + 0.5) * h / 8).toInt)
        val rgb = img.getRGB(x, y)
        out(r)(c) = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        c += 1
      }
      r += 1
    }
    out
  }

  /** Per-payload 64-bit perceptual hash (dHash): payloads that decode
    * as real images hash their sampled luminance grid; everything else
    * hashes the deterministic byte grid. One typed mapPartitions pass,
    * codec configured once per partition — no shuffle, and the
    * fingerprint is 8 bytes per payload no matter how large the media
    * is, which is what makes corpus-scale media dedup joinable. */
  def dHashes(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val grid = imageioDecode(bytes) match {
            case Some(img) => luminanceGrid(img)
            case None => byteGrid(bytes)
          }
          (id, dHashFromGrid(grid))
        }
      }.toDF(idCol, "dhash")
  }

  /** 72-dim luminance-grid feature vector — the continuous signal the
    * dHash sign-quantizes: real images via the imageio centre-sampled
    * grid, synthetic payloads via the locality-preserving byte grid.
    * Unlike [[extractFeatures]]'s chained-hash histogram (a codec-shape
    * stand-in, deliberately avalanche-y), this embedding is perceptual:
    * a small in-place edit moves one cell, so near-dup media stay
    * cosine-near — the feature to feed the [[Similarity]] ANN stack for
    * media similarity search. One typed mapPartitions pass, codec
    * configured once per partition, 72 floats per payload. */
  def gridFeatures(media: DataFrame, idCol: String = "doc_id"): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val grid = imageioDecode(bytes) match {
            case Some(img) => luminanceGrid(img)
            case None => byteGrid(bytes)
          }
          FeatureRow(id, grid.flatten.map(_.toFloat))
        }
      }
  }

  /** Perceptual near-dup pairs over binary media: dHash fingerprints
    * through the SAME hamming block-bucket machinery as SimHash text
    * dedup ([[Dedup.hammingNearDups]]) — block-bucket join + exact
    * hamming verify, never all-pairs. Returns (a_id, b_id, hamming)
    * with a_id < b_id. */
  def dHashNearDups(media: DataFrame, maxHamming: Int = 3,
                    idCol: String = "doc_id"): DataFrame =
    Dedup.hammingNearDups(dHashes(media, idCol), idCol, "dhash", maxHamming)

  /** REAL resize: decode with imageio, fit into `maxSide` via the SAME
    * [[fitDims]] geometry as the stub path, scale with Graphics2D
    * bilinear, re-encode as PNG. Payloads that fail to decode pass
    * through unchanged (format "raw") rather than failing the task;
    * already-small images pass through byte-identical. */
  def resizeImages(media: DataFrame, maxSide: Long = 128): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          imageioDecode(bytes) match {
            case None =>
              MediaRow(id, bytes, MediaMeta("raw", bytes.length.toLong, 0L, 0L))
            case Some(img) =>
              val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
              val (nw, nh) = fitDims(w, h, maxSide)
              if (nw == w && nh == h)
                MediaRow(id, bytes, MediaMeta("png", bytes.length.toLong, w, h))
              else {
                val dst = new java.awt.image.BufferedImage(nw.toInt, nh.toInt,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = dst.createGraphics()
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, nw.toInt, nh.toInt, null)
                g.dispose()
                val buf = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(dst, "png", buf)
                val out = buf.toByteArray
                MediaRow(id, out, MediaMeta("png", out.length.toLong, nw, nh))
              }
          }
        }
      }
  }
}
