package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streaming-mode execution of the SURVEY §2.5 transforms: the windowed
  * aggregation under a real watermark on a MemoryStream, and the
  * flatMapGroupsWithState sessionizer's gap-close path. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedAgg over a MemoryStream with watermark matches batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowedAgg(df, watermark = true)
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      mem.addData((ts(5), "click", 1.0), (ts(15), "click", 2.0), (ts(5), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val hour = Timestamp.valueOf("2024-01-01 10:00:00")
      assert(rows == Set((hour, "click", 2L, 3.0), (hour, "view", 1L, 5.0)))
      // batch plan over the same rows agrees (stream/batch unification)
      val batch = EventStream.windowedAgg(
        Seq((ts(5), "click", 1.0), (ts(15), "click", 2.0), (ts(5), "view", 5.0))
          .toDF("ts", "event_type", "value"))
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(batch == rows)
    } finally q.stop()
  }

  test("corpus quality gate runs unchanged on a document stream") {
    // stateless prep stages (quality score + repetition signals join by
    // id within the micro-batch) apply to readStream exactly as to read:
    // the same transform function, no streaming-specific code path
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val scored = graft.operators.TextAnalysis.qualityScore(docs)
      .where(org.apache.spark.sql.functions.col("quality_score") >= 0.5)
      .select("doc_id", "quality_score")
    val q = scored.writeStream.format("memory").queryName("doc_gate")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog and it is happy for a while today"),
        (2L, "@@@@ #### $$$$ %%%%"))
      q.processAllAvailable()
      val kept = spark.table("doc_gate").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L))
    } finally q.stop()
  }

  test("stateful sessionizer closes a session when the gap passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeStream(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then an event 40 min
      // later -> the arrival closes session 1 via the gap check
      mem.addData(EventStream.Event(1L, ts(0), 100L), EventStream.Event(1L, ts(5), 101L))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open
      mem.addData(EventStream.Event(1L, ts(45), 102L))
      q.processAllAvailable()
      val closed = spark.table("sessions")
        .as[EventStream.Session].collect().toSeq
      assert(closed.map(s => (s.user_id, s.session_start, s.session_end, s.n_events)) ==
        Seq((1L, ts(0), ts(5), 2L)))
    } finally q.stop()
  }

  test("stateful sessionizer closes idle sessions via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeStream(mem.toDS(), gapMinutes = 30, lateness = "5 minutes")
      .writeStream.format("memory").queryName("sessions_timeout")
      .outputMode("append").start()
    try {
      mem.addData(EventStream.Event(1L, ts(0), 1L))
      q.processAllAvailable()
      // another user's much-later events push the watermark past
      // user 1's last+gap -> user 1's session must close by timeout
      mem.addData(EventStream.Event(2L, Timestamp.valueOf("2024-01-01 12:00:00"), 2L))
      q.processAllAvailable()
      mem.addData(EventStream.Event(2L, Timestamp.valueOf("2024-01-01 12:01:00"), 3L))
      q.processAllAvailable()
      val closed = spark.table("sessions_timeout")
        .as[EventStream.Session].collect().toSeq
        .filter(_.user_id == 1L)
      assert(closed.map(s => (s.session_start, s.session_end, s.n_events)) ==
        Seq((ts(0), ts(0), 1L)))
    } finally q.stop()
  }

  test("foreachBatch upsert sink key-merges each micro-batch into the table") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_upsert")
    val table = s"$dir/tbl"
    val mem = MemoryStream[(Long, String, Double)]
    val df = mem.toDF().toDF("k", "name", "v")
    val q = EventStream.upsertSink(df, table, Seq("k"), s"$dir/ckpt").start()
    try {
      mem.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable()
      // batch 2 updates k=2 and inserts k=3; k=1 must survive untouched
      mem.addData((2L, "b2", 20.0), (3L, "c", 3.0))
      q.processAllAvailable()
      val out = spark.read.parquet(table).orderBy("k")
        .as[(Long, String, Double)].collect().toSeq
      assert(out == Seq((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0)))
    } finally q.stop()
  }

  test("streaming corpus ingest dedups each batch against ALL history") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val q = EventStream.dedupIngestSink(mem.toDF().toDF("doc_id", "text"),
      s"$base/corpus", s"$base/fp", s"$base/ckpt").start()
    try {
      mem.addData((1L, "doc one"), (2L, "doc two"), (3L, "doc one")) // 3 = in-batch dup
      q.processAllAvailable()
      mem.addData((4L, "doc two"), (5L, "doc three")) // 4 = dup from an EARLIER batch
      q.processAllAvailable()
      val ids = spark.read.parquet(s"$base/corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 5L))
      // fingerprint history covers every distinct doc ever admitted
      assert(spark.read.parquet(s"$base/fp").distinct().count() == 3)
    } finally q.stop()
  }

  test("streaming decontaminate ingest drops benchmark-overlapping docs per batch") {
    implicit val sqlCtx = spark.sqlContext
    val shared = (0 until 8).map(i => s"secret$i").mkString(" ")
    val bench = Seq((100L, s"benchmark question $shared answer here"))
      .toDF("doc_id", "text")
    val idxDir = java.nio.file.Files.createTempDirectory("graft_decontam_idx").toString
    graft.operators.Contamination.buildBenchmarkIndex(bench, idxDir, n = 8)
    val clean1 = (0 until 20).map(i => s"alpha$i").mkString(" ")
    val clean2 = (0 until 20).map(i => s"beta$i").mkString(" ")
    val mem = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_decontam_ingest").toString
    val q = EventStream.decontaminateIngestSink(mem.toDF().toDF("doc_id", "text"),
      idxDir, s"$base/corpus", s"$base/ckpt").start()
    try {
      mem.addData((1L, clean1), (2L, s"prefix $shared suffix words"))
      q.processAllAvailable()
      mem.addData((3L, clean2), (4L, s"also contains $shared embedded"))
      q.processAllAvailable()
      val ids = spark.read.parquet(s"$base/corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("streaming near-dup ingest drops near-duplicates arriving in later batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_neardup_ingest").toString
    val q = EventStream.nearDupIngestSink(mem.toDF().toDF("doc_id", "text"),
      s"$base/corpus", s"$base/state", s"$base/ckpt", threshold = 0.8).start()
    val words = (0 until 40).map(i => s"alpha$i").mkString(" ")
    val nearDup = (0 until 40).map(i => if (i == 20) "CHANGED" else s"alpha$i").mkString(" ")
    val other = (0 until 40).map(i => s"beta$i").mkString(" ")
    val novel = (0 until 40).map(i => s"gamma$i").mkString(" ")
    try {
      mem.addData((1L, words), (2L, other))
      q.processAllAvailable()
      // 3 = near-dup of doc 1 from an EARLIER batch; 4 = novel;
      // 5 = in-batch near-dup of 4 (larger id loses)
      mem.addData((3L, nearDup), (4L, novel), (5L, novel + " tail"))
      q.processAllAvailable()
      val ids = spark.read.parquet(s"$base/corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 4L))
      // durable state covers exactly the admitted docs
      assert(spark.read.parquet(s"$base/state/shingle_sets")
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("near-dup ingest batch replay is idempotent: no duplicate corpus rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_neardup_replay").toString
    val corpus = s"$base/corpus"
    val state = s"$base/state"
    val words = (0 until 40).map(i => s"delta$i").mkString(" ")
    val other = (0 until 40).map(i => s"eps$i").mkString(" ")
    val b0 = Seq((1L, words), (2L, other)).toDF("doc_id", "text")
    EventStream.nearDupIngestBatch(b0, 0L, corpus, state, 0.8)
    // crash-replay of batch 0: same data, same batch id — partitions are
    // overwritten, never appended, and the state read excludes the
    // batch's own previous attempt
    EventStream.nearDupIngestBatch(b0, 0L, corpus, state, 0.8)
    assert(spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().toSeq.sorted == Seq(1L, 2L))
    // the NEXT batch still dedups against batch 0's state: doc 3 is a
    // near-dup of doc 1 and must drop
    val nearDup = (0 until 40).map(i => if (i == 20) "X" else s"delta$i").mkString(" ")
    val b1 = Seq((3L, nearDup), (4L, (0 until 40).map(i => s"zeta$i").mkString(" ")))
      .toDF("doc_id", "text")
    EventStream.nearDupIngestBatch(b1, 1L, corpus, state, 0.8)
    assert(spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L, 4L))
  }

  test("streaming heavy hitters: all-history floor counts, MG bound, idempotent replay") {
    val base = java.nio.file.Files.createTempDirectory("graft_hh").toString
    val state = s"$base/state"
    val k = 8
    // batch 0: 'alpha' x30 dominates; background terms are singletons
    val b0 = Seq((1L, ("alpha " * 30) + (1 to 20).map(i => s"bg$i").mkString(" ")))
      .toDF("doc_id", "text")
    EventStream.heavyHitterBatch(b0, 0L, state, k, "text")
    // crash-replay of batch 0 must not double the counts
    EventStream.heavyHitterBatch(b0, 0L, state, k, "text")
    val afterReplay = EventStream.heavyHittersFrom(spark, state, topK = 3).collect()
    val alpha0 = afterReplay.find(_.getString(0) == "alpha").get
    assert(alpha0.getAs[Long]("c") <= 30,
      "replay must overwrite, never accumulate")
    // batch 1: 'alpha' x25 more + 'beta' x20 — summary merges across history
    val b1 = Seq((2L, ("alpha " * 25) + ("beta " * 20) +
      (21 to 40).map(i => s"bg$i").mkString(" "))).toDF("doc_id", "text")
    EventStream.heavyHitterBatch(b1, 1L, state, k, "text")
    val top = EventStream.heavyHittersFrom(spark, state, topK = 3).collect()
    val byTerm = top.map(r => r.getString(0) -> r.getAs[Long]("c")).toMap
    val bound = top.head.getAs[Double]("err_bound")
    val nTotal = 30 + 20 + 25 + 20 + 20
    assert(math.abs(bound - nTotal / (k + 1.0)) < 1e-9)
    // MG floor-count contract vs true all-history counts (55 alpha, 20 beta):
    // floor <= true < floor + bound, and both guaranteed-heavy terms present
    Seq("alpha" -> 55L, "beta" -> 20L).foreach { case (t, truth) =>
      assert(byTerm.contains(t), s"$t (true count $truth > bound $bound) must survive")
      assert(byTerm(t) <= truth && truth < byTerm(t) + bound,
        s"$t floor=${byTerm(t)} true=$truth bound=$bound")
    }
    assert(top.head.getString(0) == "alpha" && top.head.getAs[Long]("rk") == 1L)
  }

  // 64-dim unit-ish vector on `axis`, optionally nudged toward the next
  // axis — cosine(vec(a), vec(a, eps)) ≈ 1 >> 0.45; different axes are
  // orthogonal (cosine 0 < 0.45)
  private def vec64(axis: Int, eps: Float = 0f): Seq[Float] =
    Seq.tabulate(64)(i =>
      if (i == axis) 1f else if (i == (axis + 1) % 64 && eps != 0f) eps else 0f)

  test("streaming embedding-dedup ingest drops near-dups arriving in later batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_embsink").toString
    // corpus model built once: vectors 1 (axis 0) and 2 (axis 1)
    val corpus = Seq((1L, vec64(0)), (2L, vec64(1)))
      .toDF("vec_id", "embedding")
    graft.operators.Dedup.buildEmbeddingDedupState(corpus, s"$base/model")
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EventStream.embeddingDedupIngestSink(
      mem.toDF().toDF("vec_id", "embedding"),
      s"$base/model", s"$base/corpus", s"$base/state", s"$base/ckpt",
      threshold = 0.45).start()
    try {
      // 10 = near-dup of MODEL vector 1; 11 = novel (axis 2)
      mem.addData((10L, vec64(0, 0.1f)), (11L, vec64(2)))
      q.processAllAvailable()
      // 12 = near-dup of 11 from an EARLIER BATCH (durable state, not
      // the model); 13 = novel; 14 = in-batch near-dup of 13 (larger
      // id loses)
      mem.addData((12L, vec64(2, 0.1f)), (13L, vec64(3)),
        (14L, vec64(3, 0.1f)))
      q.processAllAvailable()
      val ids = spark.read.parquet(s"$base/corpus")
        .select("vec_id").as[Long].collect().toSet
      assert(ids == Set(11L, 13L))
      // durable state covers exactly the admitted vectors
      assert(spark.read.parquet(s"$base/state/vectors")
        .select("vec_id").as[Long].collect().toSet == Set(11L, 13L))
    } finally q.stop()
  }

  test("embedding-dedup ingest batch replay is idempotent: no duplicate corpus rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_embsink_replay").toString
    val corpusDir = s"$base/corpus"
    val state = s"$base/state"
    graft.operators.Dedup.buildEmbeddingDedupState(
      Seq((1L, vec64(0))).toDF("vec_id", "embedding"), s"$base/model")
    val b0 = Seq((10L, vec64(2)), (11L, vec64(3))).toDF("vec_id", "embedding")
    EventStream.embeddingDedupIngestBatch(b0, 0L, s"$base/model", corpusDir, state, 0.45)
    // crash-replay of batch 0: same data, same batch id — partitions are
    // overwritten, never appended, and the state read excludes the
    // batch's own previous attempt
    EventStream.embeddingDedupIngestBatch(b0, 0L, s"$base/model", corpusDir, state, 0.45)
    assert(spark.read.parquet(corpusDir).select("vec_id")
      .as[Long].collect().toSeq.sorted == Seq(10L, 11L))
    // the NEXT batch still dedups against batch 0's state AND the model
    val b1 = Seq((20L, vec64(2, 0.1f)), (21L, vec64(0, 0.1f)), (22L, vec64(4)))
      .toDF("vec_id", "embedding")
    EventStream.embeddingDedupIngestBatch(b1, 1L, s"$base/model", corpusDir, state, 0.45)
    assert(spark.read.parquet(corpusDir).select("vec_id")
      .as[Long].collect().toSet == Set(10L, 11L, 22L))
  }

  test("streaming ANN serving: query batches probe the stored index, results per batch") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_annserve").toString
    val corpus = spark.read.parquet(s"${sf()}/embeddings.parquet")
    graft.operators.Similarity.buildIvfPqIndex(corpus, s"$base/index")
    val offset = 1000000L
    val clones = corpus.where(col("vec_id") < 3)
      .select((col("vec_id") + offset).as("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EventStream.annServeSink(
      mem.toDF().toDF("vec_id", "embedding"), corpus,
      s"$base/index", s"$base/results", s"$base/ckpt", k = 5).start()
    try {
      mem.addData(clones(0), clones(1))
      q.processAllAvailable()
      mem.addData(clones(2))
      q.processAllAvailable()
      val res = spark.read.parquet(s"$base/results")
        .select("q_id", "n_id", "rank", "cos_sim", "__batch_id")
        .as[(Long, Long, Long, Double, Long)].collect()
      // every query answered in its own batch partition, k rows each
      assert(res.groupBy(_._1).keySet == clones.map(_._1).toSet)
      assert(res.groupBy(_._1).values.forall(_.length == 5))
      assert(res.filter(_._5 == 0L).map(_._1).toSet ==
        Set(clones(0)._1, clones(1)._1))
      assert(res.filter(_._5 == 1L).map(_._1).toSet == Set(clones(2)._1))
      // each clone query finds its indexed twin at rank 1, cos 1.0
      assert(res.filter(_._3 == 1L).forall {
        case (qid, nid, _, c, _) => nid == qid - offset && c == 1.0 })
    } finally q.stop()
  }

  test("ANN serving batch replay is idempotent: results overwrite, never append") {
    val base = java.nio.file.Files.createTempDirectory("graft_annserve_replay").toString
    val corpus = spark.read.parquet(s"${sf()}/embeddings.parquet")
    graft.operators.Similarity.buildIvfPqIndex(corpus, s"$base/index")
    val batch = corpus.where(col("vec_id") < 2)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    EventStream.annServeBatch(batch, 0L, corpus, s"$base/index",
      s"$base/results", 5, 4, 5)
    val first = spark.read.parquet(s"$base/results")
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().sorted.toSeq
    // crash-replay: same batch id — deterministic search + dynamic
    // overwrite rewrite the partition; row set is unchanged
    EventStream.annServeBatch(batch, 0L, corpus, s"$base/index",
      s"$base/results", 5, 4, 5)
    val replayed = spark.read.parquet(s"$base/results")
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(first == replayed && first.size == 10)
  }

  test("stream-stream interval join bounds state with watermarks; matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val vdf = views.toDF().toDF("user_id", "ts", "event_id")
    val q = EventStream.intervalJoin(cdf, vdf, "user_id",
        within = "10 minutes", watermark = true)
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), 100L), (2L, ts(0), 101L))
      views.addData((1L, ts(5), 200L), (1L, ts(20), 201L), (2L, ts(8), 202L))
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select("k", "l_event", "r_event")
        .as[(Long, Long, Long)].collect().toSet
      // (1,100)-(1,201) is outside the 10-min band; everything else in
      assert(rows == Set((1L, 100L, 200L), (2L, 101L, 202L)))
      // identical rows from the batch form of the same plan
      val batch = EventStream.intervalJoin(
        Seq((1L, ts(0), 100L), (2L, ts(0), 101L)).toDF("user_id", "ts", "event_id"),
        Seq((1L, ts(5), 200L), (1L, ts(20), 201L), (2L, ts(8), 202L)).toDF("user_id", "ts", "event_id"),
        "user_id", within = "10 minutes")
        .select("k", "l_event", "r_event").as[(Long, Long, Long)].collect().toSet
      assert(batch == rows)
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicates with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("event_id", "ts")
    val q = EventStream.dedupStream(df, Seq("event_id"), lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(2)))
      q.processAllAvailable()
      mem.addData((2L, ts(3)), (3L, ts(4))) // 2 is a dup, 3 is new
      q.processAllAvailable()
      val ids = spark.table("dedup_stream")
        .select("event_id").as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("batch sessionize splits on gap and counts events") {
    val events = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(50), 3L),
      (2L, ts(0), 4L)).toDF("user_id", "ts", "event_id")
    val out = EventStream.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("native session_window agrees with the lag-based sessionizer") {
    val events = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(50), 3L),
      (2L, ts(0), 4L)).toDF("user_id", "ts", "event_id")
    val lagBased = EventStream.sessionize(events, gapMinutes = 30)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    val native = EventStream.sessionizeNative(events, gapMinutes = 30)
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(native == lagBased)

    // and it runs as a streaming aggregation with watermark-closed sessions
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = EventStream.sessionizeNative(
        mem.toDF().toDF("user_id", "ts"), gapMinutes = 30,
        watermark = Some("5 minutes"))
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0)), (1L, ts(10)))
      q.processAllAvailable()
      // push the watermark far past the gap -> session closes
      mem.addData((2L, Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      mem.addData((2L, Timestamp.valueOf("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val closed = spark.table("native_sessions")
        .where(col("user_id") === 1L)
        .select("n_events").as[Long].collect().toSeq
      assert(closed == Seq(2L))
    } finally q.stop()
  }
}
