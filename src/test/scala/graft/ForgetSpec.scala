package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Dedup, Forget, Similarity}
import graft.streaming.EventStream

/** Deletion propagation (right-to-be-forgotten) through the corpus and
  * every row-keyed stored artifact: the contract is behavioral — after a
  * forget, the pipeline acts as if the documents were never ingested
  * (their near-copies are admitted again), while everything kept behaves
  * unchanged. */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_forget_$tag").toString

  test("forgetDocs/forgetAudit: anti-join semantics and audit volumes agree") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val del = docs.where(col("doc_id") % 17 === 3).select("doc_id")
    val kept = Forget.forgetDocs(docs, del)
    assert(kept.count() == docs.count() - del.count())
    assert(kept.join(del, Seq("doc_id"), "left_semi").count() == 0)
    val audit = Forget.forgetAudit(docs, del)
      .agg(sum("n_deleted"), sum("n_kept")).as[(Long, Long)].head()
    assert(audit == ((del.count(), kept.count())))
  }

  test("deletion changelog replays to the same state as the anti-join") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val del = docs.where(col("doc_id") % 17 === 3).select("doc_id")
    // downstream copy = insert log of the full corpus, then the tombstones
    val inserts = docs.select(col("doc_id"), lit("I").as("op"), lit(1L).as("seq"),
      col("text"))
    val tombs = Forget.deletionChangeLog(del, seq = 2L).withColumn("text", lit(null: String))
    val replayed = Cdc.applyChangeLog(
      inserts.unionByName(tombs.select(col("doc_id"), col("op"), col("seq"), col("text"))),
      keyCols = Seq("doc_id"), seqCols = Seq("seq"))
    val expected = Forget.forgetDocs(docs, del)
    assert(replayed.select("doc_id").as[Long].collect().sorted.toSeq ==
      expected.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("forgetFingerprints: forgotten content is admitted again, kept content still drops") {
    val base = tmp("fp")
    val fpDir = s"$base/fps"
    val d1 = (1L, "the quick brown fox jumps over the lazy dog one")
    val d2 = (2L, "an entirely different second document body here two")
    val corpus = Seq(d1, d2).toDF("doc_id", "text")
    corpus.select(md5(col("text")).as("fingerprint")).write.parquet(fpDir)
    // forget doc 1's content
    Forget.forgetFingerprints(spark, fpDir,
      Seq(d1).toDF("doc_id", "text").select(md5(col("text")).as("fingerprint")))
    val resub = Seq((10L, d1._2), (11L, d2._2), (12L, "novel three"))
      .toDF("doc_id", "text")
    val admitted = Dedup.exactIncrement(
        spark.read.parquet(fpDir), resub, existingIsFingerprints = true)
      .select("doc_id").as[Long].collect().toSet
    // 10 = re-submission of FORGOTTEN content -> admitted again (the
    // GDPR-correct behavior); 11 = kept content -> still dropped
    assert(admitted == Set(10L, 12L))
  }

  test("forget through streaming near-dup state: forgotten doc stops suppressing its near-copies") {
    val base = tmp("nd")
    val corpus = s"$base/corpus"
    val state = s"$base/state"
    val words = (0 until 40).map(i => s"alpha$i").mkString(" ")
    val other = (0 until 40).map(i => s"beta$i").mkString(" ")
    val lone = (0 until 40).map(i => s"gamma$i").mkString(" ")
    EventStream.nearDupIngestBatch(
      Seq((1L, words), (2L, other)).toDF("doc_id", "text"), 0L, corpus, state, 0.8)
    EventStream.nearDupIngestBatch(
      Seq((3L, lone)).toDF("doc_id", "text"), 1L, corpus, state, 0.8)
    // sanity: near-copies of 1 and 3 are suppressed before the forget
    def nearCopy(s: String) = s.replace("20", "CHANGED")
    val probe = Seq((10L, nearCopy(words)), (11L, nearCopy(lone)),
      (12L, nearCopy(other))).toDF("doc_id", "text")
    EventStream.nearDupIngestBatch(probe, 2L, corpus, state, 0.8)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 3L))
    // forget docs 1 and 3 (3 = the ONLY row of batch 1: its partitions
    // must disappear entirely) from corpus + both state tables
    val del = Seq(1L, 3L).toDF("doc_id")
    Forget.forgetPartitionedState(spark, corpus, del, "doc_id")
    Forget.forgetPartitionedState(spark, s"$state/shingle_sets", del, "doc_id")
    Forget.forgetPartitionedState(spark, s"$state/band_buckets",
      del.withColumnRenamed("doc_id", "id"), "id")
    assert(!new java.io.File(s"$state/shingle_sets/__batch_id=1").exists())
    // the SAME probe now admits near-copies of the forgotten docs and
    // still drops the near-copy of kept doc 2
    EventStream.nearDupIngestBatch(probe, 3L, corpus, state, 0.8)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      == Set(2L, 10L, 11L))
    // idempotent: re-running the forget finds nothing to touch
    Forget.forgetPartitionedState(spark, s"$state/shingle_sets", del, "doc_id")
    assert(spark.read.parquet(s"$state/shingle_sets")
      .select("doc_id").as[Long].collect().toSet == Set(2L, 10L, 11L))
  }

  test("forget through a stored embedding-dedup model: probe admits the forgotten vector's copy") {
    val base = tmp("emb")
    val dim = 32
    def oneHot(i: Int): Array[Double] =
      Array.tabulate(dim)(d => if (d == i % dim) 1.0 else 0.0)
    val corpus = (0 until 20).map(i => (i.toLong, oneHot(i)))
      .toDF("vec_id", "embedding")
    Dedup.buildEmbeddingDedupState(corpus, base)
    val incoming = Seq(
      (101L, oneHot(5)),   // copy of vec 5
      (102L, oneHot(6)),   // copy of vec 6
      (103L, oneHot(30))). // novel direction
      toDF("vec_id", "embedding")
    val before = Dedup.embeddingIncrementStored(incoming, base)
      .select("vec_id").as[Long].collect().toSet
    assert(before == Set(103L))
    Forget.forgetEmbeddingModel(spark, base, Seq(5L).toDF("vec_id"))
    val after = Dedup.embeddingIncrementStored(incoming, base)
      .select("vec_id").as[Long].collect().toSet
    // 101 (copy of FORGOTTEN 5) admitted; 102 (copy of kept 6) still dropped
    assert(after == Set(101L, 103L))
    // meta reflects the reduced corpus
    assert(spark.read.parquet(s"$base/meta").select("n_vecs")
      .as[Long].head() == 19L)
  }

  test("forget through a stored IVF-PQ index == filtered search over the original") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val dirA = tmp("ivf_a")
    val dirB = tmp("ivf_b")
    Similarity.buildIvfPqIndex(emb, dirA)
    Similarity.buildIvfPqIndex(emb, dirB) // deterministic: identical model
    val del = emb.where(col("vec_id") % 9 === 2).select(col("vec_id"))
    Forget.forgetIvfPqIndex(spark, dirB, del)
    val delSet = del.as[Long].collect().toSet
    def run(dir: String, filter: org.apache.spark.sql.Column) =
      Similarity.searchIvfPqIndex(emb, col("vec_id") < 10, dir, k = 10,
          corpusFilter = filter)
        .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().toSeq.sorted
    val forgotten = run(dirB, null)
    assert(forgotten.forall { case (_, n, _) => !delSet.contains(n) })
    assert(forgotten == run(dirA, !col("vec_id").isin(delSet.toSeq: _*)))
  }

  test("recoverRewrite heals an interrupted swap from either crash window") {
    val base = tmp("recover")
    val dir = s"$base/table"
    Seq((1L, "a"), (2L, "b")).toDF("id", "x").write.parquet(dir)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window: table staged away, rewrite never committed
    f.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"${dir}__old"))
    Forget.recoverRewrite(spark, dir)
    assert(spark.read.parquet(dir).count() == 2)
    // crash window: rewrite committed, stale __old left behind -> dropped
    f.mkdirs(new org.apache.hadoop.fs.Path(s"${dir}__old"))
    Forget.recoverRewrite(spark, dir)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"${dir}__old")))
    assert(spark.read.parquet(dir).count() == 2)
    // and the end-to-end rewrite survives: forget id 1
    Forget.forgetStateTable(spark, dir, Seq(1L).toDF("id"), "id")
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSeq == Seq(2L))
  }
}
