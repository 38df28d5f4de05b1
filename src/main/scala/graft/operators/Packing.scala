package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Sequence packing — the step that turns a filtered document corpus
  * into fixed-length training sequences: documents are concatenated in
  * a canonical order (by id) into one token stream, and the stream is
  * cut into context windows of `budget` tokens. Each document is
  * assigned the window its first token lands in (`seq_id`), its offset
  * inside that window, and how many windows it spans — exactly what a
  * downstream tokenizer/writer needs to materialise packed sequences.
  *
  * The global running token offset is a prefix sum over the whole
  * corpus. A naive `sum over (order by id)` window has no partition key
  * and would drag 100 TB through ONE task, so it is computed as a
  * distributed two-level scan instead:
  *   1. ids are bucketed by deterministic arithmetic ranges (never
  *      sampling — reruns and retries bucket identically),
  *   2. within-bucket prefix sums run as a partitioned window (parallel
  *      across buckets),
  *   3. the per-bucket totals — at most `buckets` rows — come to the
  *      driver, are prefix-summed there (the same "k small values on the
  *      driver" legitimacy as IVF centroids), and rejoin as a broadcast.
  * Total cost: one narrow aggregation, one partitioned window, one
  * broadcast join; nothing global, nothing quadratic.
  */
object Packing {

  /** (doc_id, n_tokens, seq_id, seq_offset, n_seqs) for every doc.
    * `tokens` defaults to the whitespace token count of `text`. Offsets
    * use long integer arithmetic end to end (`div`/`%`), never doubles,
    * so a 100-TB-scale cumulative token count cannot lose precision. */
  def packSequences(docs: DataFrame, budget: Long, idCol: String = "doc_id",
                    tokens: Column = null, buckets: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    val tokCol = if (tokens == null) wsTokenCount(col("text")) else tokens
    val base = docs.select(col(idCol), tokCol.cast("long").as("n_tokens"))

    val Array(minId, maxId) = base.agg(min(idCol), max(idCol)).collect()(0) match {
      case r if r.isNullAt(0) => Array(0L, 0L) // empty input
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val width = math.max(1L, (maxId - minId + buckets) / buckets)
    val bucketed = base.withColumn("bucket",
      expr(s"($idCol - ${minId}L) div ${width}L"))

    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = bucketed
      .withColumn("local_end", sum("n_tokens").over(w))

    // Per-bucket totals -> driver-side exclusive prefix sum -> broadcast.
    val totals = bucketed.groupBy("bucket").agg(sum("n_tokens").as("bucket_total"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, t)) => (b, acc + t)
    }.tail.zip(totals).map { case ((b, end), (_, t)) => (b, end - t) }
    val spark = docs.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("bucket", "bucket_offset")

    withLocal.join(broadcast(offsetDf), "bucket")
      .withColumn("start_off", col("bucket_offset") + col("local_end") - col("n_tokens"))
      .withColumn("seq_id", expr(s"start_off div ${budget}L"))
      .withColumn("seq_offset", col("start_off") % budget)
      .withColumn("n_seqs", when(col("n_tokens") === 0, lit(1L))
        .otherwise(expr(s"(start_off + n_tokens - 1) div ${budget}L") - col("seq_id") + lit(1L)))
      .select(col(idCol), col("n_tokens"), col("seq_id"), col("seq_offset"), col("n_seqs"))
  }

  /** Group-scoped packing: independent sequence streams per group (pack
    * train/val/test separately — a context window must never mix
    * splits, and per-domain packing keeps domains contiguous). Same
    * two-level distributed prefix sum as [[packSequences]], with the
    * bucket bookkeeping keyed by (group, bucket): the within-bucket
    * window partitions by group AND bucket, and the driver-side prefix
    * sum runs per group over at most groups x buckets small rows. */
  def packSequencesBy(docs: DataFrame, budget: Long, groupCols: Seq[String],
                      idCol: String = "doc_id", tokens: Column = null,
                      buckets: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(groupCols.nonEmpty, "use packSequences for ungrouped packing")
    val tokCol = if (tokens == null) wsTokenCount(col("text")) else tokens
    val gcols = groupCols.map(col)
    val base = docs.select(gcols :+ col(idCol) :+ tokCol.cast("long").as("n_tokens"): _*)

    val Array(minId, maxId) = base.agg(min(idCol), max(idCol)).collect()(0) match {
      case r if r.isNullAt(0) => Array(0L, 0L)
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val width = math.max(1L, (maxId - minId + buckets) / buckets)
    val bucketed = base.withColumn("bucket",
      expr(s"($idCol - ${minId}L) div ${width}L"))

    val w = Window.partitionBy(gcols :+ col("bucket"): _*).orderBy(idCol)
    val withLocal = bucketed.withColumn("local_end", sum("n_tokens").over(w))

    // (group key, bucket, total) -> per-group exclusive prefix sums
    val totals = bucketed.groupBy(gcols :+ col("bucket"): _*)
      .agg(sum("n_tokens").as("bucket_total"))
      .collect().map { r =>
        val key = groupCols.indices.map(r.get).toIndexedSeq
        (key, r.getLong(groupCols.length), r.getLong(groupCols.length + 1))
      }
    val offsetRows = totals.groupBy(_._1).toSeq.flatMap { case (key, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.scanLeft(0L)((acc, r) => acc + r._3).zip(sorted).map {
        case (off, (_, b, _)) => org.apache.spark.sql.Row.fromSeq(key ++ Seq(b, off))
      }
    }
    val spark = docs.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      base.schema.fields.take(groupCols.length) ++ Seq(
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bucket_offset",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), schema)

    withLocal.join(broadcast(offsetDf), groupCols :+ "bucket")
      .withColumn("start_off", col("bucket_offset") + col("local_end") - col("n_tokens"))
      .withColumn("seq_id", expr(s"start_off div ${budget}L"))
      .withColumn("seq_offset", col("start_off") % budget)
      .withColumn("n_seqs", when(col("n_tokens") === 0, lit(1L))
        .otherwise(expr(s"(start_off + n_tokens - 1) div ${budget}L") - col("seq_id") + lit(1L)))
      .select(gcols ++ Seq(col(idCol), col("n_tokens"), col("seq_id"),
        col("seq_offset"), col("n_seqs")): _*)
  }

  /** Best-fit sequence packing WITHOUT document splitting (the
    * histogram-packing design of Krell et al. 2021, "Efficient Sequence
    * Packing without Cross-contamination"): each context window holds
    * only whole documents, so no training sequence ever crosses a
    * document boundary, and padding waste is minimised by bin packing
    * instead of [[packSequences]]'s concat-and-chunk (zero padding, but
    * documents split across windows).
    *
    * Scale shape — the corpus is never packed directly:
    *   1. ONE tiny aggregation builds the length histogram (at most
    *      `budget` distinct clamped lengths);
    *   2. first-fit-decreasing runs driver-side ON THE HISTOGRAM in
    *      grouped form (bins with identical remaining capacity and slot
    *      profile advance as one unit), yielding "strategies" — slot
    *      profiles with bin counts — exactly how the published packers
    *      solve it; cost is histogram-sized, independent of corpus rows;
    *   3. docs rank within their length by the same two-level scheme as
    *      [[packSequencesBy]] (partitioned window per (length, id-range
    *      bucket) + a driver prefix over histogram x buckets counts —
    *      the collect is histogram-bounded, never corpus-bounded);
    *   4. a broadcast of the strategy table maps (length, rank) to a
    *      bin id arithmetically. One partitioned window + one broadcast
    *      join; nothing global, nothing quadratic.
    *
    * Docs longer than `budget` are clamped to a full window and flagged
    * (`clamped`) — the writer decides truncate-vs-chunk; empty docs
    * pack as length 1 (a packed writer emits at least one EOS token per
    * doc). Deterministic end to end: histogram order, grouped-FFD tie
    * breaks, and rank order are all value-based. */
  def packBestFit(docs: DataFrame, budget: Long, idCol: String = "doc_id",
                  tokens: Column = null, buckets: Int = 64): DataFrame = {
    require(budget > 0, "budget must be positive")
    val tokCol = if (tokens == null) wsTokenCount(col("text")) else tokens
    // the id is cast to long ONCE under an internal simple name, so an
    // Int id column (or one whose name needs quoting) neither breaks the
    // driver-side getLong bounds nor the bucket expression below
    val base = docs.select(col(idCol).cast("long").as("__pb_id"),
        tokCol.cast("long").as("n_tokens"))
      .withColumn("pack_len", least(greatest(col("n_tokens"), lit(1L)), lit(budget)))
      .withColumn("clamped", col("n_tokens") > budget)

    // 1. length histogram (at most `budget` rows on the driver)
    val hist = base.groupBy("pack_len").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    if (hist.isEmpty) {
      return base.withColumn("bin_id", lit(0L)).limit(0)
        .select(col("__pb_id").as(idCol), col("n_tokens"), col("pack_len"),
          col("clamped"), col("bin_id"))
    }

    // 2. grouped first-fit-decreasing on the histogram. A "group" is a
    // set of bins with identical (remaining capacity, slot profile);
    // assigning one doc of length l to every bin of the best-fitting
    // group advances min(n, group size) docs per step, so the loop is
    // histogram-shaped (groups x lengths), not doc-shaped.
    final case class Group(rem: Long, slots: Vector[Long], var n: Long)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    hist.foreach { case (len, cnt) =>
      var left = cnt
      while (left > 0) {
        // best fit = smallest remaining capacity that still fits; ties
        // by earliest-created group (stable index order)
        var gi = -1
        var i = 0
        while (i < groups.size) {
          val g = groups(i)
          if (g.rem >= len && (gi < 0 || g.rem < groups(gi).rem)) gi = i
          i += 1
        }
        if (gi < 0) {
          // nothing open fits: open exactly the bins this length still
          // needs at full-bin occupancy (ceil division) — later lengths
          // best-fit into whatever slack remains
          val perBin = budget / len
          groups += Group(budget, Vector.empty,
            (left + perBin - 1) / perBin)
        } else {
          val g = groups(gi)
          val take = math.min(left, g.n)
          if (take < g.n) {
            groups += Group(g.rem, g.slots, g.n - take) // untouched split
            g.n = take
          }
          groups(gi) = Group(g.rem - len, g.slots :+ len, g.n)
          left -= take
        }
      }
    }

    // canonical strategy order (slot profile lexicographic) -> stable
    // bin-id ranges regardless of mutation history
    val strategies = groups.toIndexedSeq
      .sortBy(g => g.slots.mkString(","))
    val binBase = strategies.scanLeft(0L)((acc, g) => acc + g.n)

    // 3. rank docs within their length: two-level distributed rank
    val Array(minId, maxId) = base.agg(min("__pb_id"), max("__pb_id")).collect()(0) match {
      case r if r.isNullAt(0) => Array(0L, 0L)
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val width = math.max(1L, (maxId - minId + buckets) / buckets)
    val bucketed = base.withColumn("bucket",
      expr(s"(__pb_id - ${minId}L) div ${width}L"))
    val w = Window.partitionBy("pack_len", "bucket").orderBy("__pb_id")
    val ranked = bucketed.withColumn("local_rank", row_number().over(w).cast("long"))
    val counts = bucketed.groupBy("pack_len", "bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val bucketOff = counts.groupBy(_._1._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._1._2)
      sorted.scanLeft(0L)((acc, r) => acc + r._2).zip(sorted).map {
        case (off, ((len, b), _)) => (len, b, off)
      }
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = bucketOff.toDF("pack_len", "bucket", "rank_off")

    // 4. (length, rank) -> bin id: one row per (strategy, length) with
    // the rank range that strategy's bins consume, in canonical order
    val assignRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    val nextRank = scala.collection.mutable.HashMap.empty[Long, Long]
    strategies.zipWithIndex.foreach { case (g, si) =>
      g.slots.groupBy(identity).toSeq.sortBy(_._1).foreach { case (len, ss) =>
        val k = ss.size.toLong
        val start = nextRank.getOrElse(len, 0L)
        assignRows += ((len, start, start + g.n * k, k, binBase(si)))
        nextRank(len) = start + g.n * k
      }
    }
    val assignDf = assignRows.toSeq
      .toDF("pack_len", "rank_start", "rank_end", "k", "bin_base")

    ranked.join(broadcast(offDf), Seq("pack_len", "bucket"))
      .withColumn("rank", col("rank_off") + col("local_rank") - 1)
      .join(broadcast(assignDf), Seq("pack_len"))
      .where(col("rank") >= col("rank_start") && col("rank") < col("rank_end"))
      .withColumn("bin_id",
        col("bin_base") + expr("(rank - rank_start) div k"))
      .select(col("__pb_id").as(idCol), col("n_tokens"), col("pack_len"),
        col("clamped"), col("bin_id"))
  }

  /** Per-bin audit for [[packBestFit]] output: fill, padding waste. */
  def binSummary(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("pack_len").as("fill"))
      .withColumn("waste", lit(budget) - col("fill"))

  /** Document chunking — the other half of sequence shaping: split each
    * long document into fixed `budget`-token windows (chunk 0 holds
    * tokens [0, budget), chunk 1 [budget, 2*budget), ...). One row per
    * chunk with its token span; empty docs keep a single empty chunk so
    * no document silently disappears. Pure projection + generator
    * (explode of a sequence) — no shuffle, no state, embarrassingly
    * parallel at any scale. */
  def chunkDocuments(docs: DataFrame, budget: Long, idCol: String = "doc_id",
                     tokens: Column = null): DataFrame = {
    require(budget > 0, "budget must be positive")
    val tokCol = if (tokens == null) wsTokenCount(col("text")) else tokens
    docs.select(col(idCol), tokCol.cast("long").as("n_tokens"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), expr(s"greatest(n_tokens - 1, 0L) div ${budget}L"))))
      .withColumn("chunk_start", col("chunk_id") * budget)
      .withColumn("chunk_tokens",
        least(col("n_tokens") - col("chunk_start"), lit(budget)))
      .select(col(idCol), col("n_tokens"), col("chunk_id"),
        col("chunk_start"), col("chunk_tokens"))
  }

  /** OVERLAPPING chunk rows — the retrieval/RAG indexing form of
    * [[chunkDocuments]]: consecutive chunks share `overlap` tokens so
    * a passage never loses context by straddling a boundary. Chunk i
    * starts at i·(budget − overlap); emission stops once a start could
    * only re-cover the previous chunk's overlap region (start <
    * max(n − overlap, 1)), so the final chunk is the only one that may
    * be short and no chunk is fully redundant. `overlap = 0` is
    * byte-identical to [[chunkDocuments]] (spec-pinned). Same
    * zero-shuffle projection + generator shape. */
  def chunkDocumentsOverlap(docs: DataFrame, budget: Long, overlap: Long,
                            idCol: String = "doc_id",
                            tokens: Column = null): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(overlap >= 0 && overlap < budget, "overlap must be in [0, budget)")
    val stride = budget - overlap
    val tokCol = if (tokens == null) wsTokenCount(col("text")) else tokens
    docs.select(col(idCol), tokCol.cast("long").as("n_tokens"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          expr(s"greatest(n_tokens - ${overlap}L - 1L, 0L) div ${stride}L"))))
      .withColumn("chunk_start", col("chunk_id") * stride)
      .withColumn("chunk_tokens",
        least(col("n_tokens") - col("chunk_start"), lit(budget)))
      .select(col(idCol), col("n_tokens"), col("chunk_id"),
        col("chunk_start"), col("chunk_tokens"))
  }
}
