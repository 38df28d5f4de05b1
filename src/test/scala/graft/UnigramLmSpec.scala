package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramLm

/** Unigram-LM tokenizer certification: Viterbi encoder optimality on
  * hand-computed lattices, OOV-free char fallback with exact
  * round-trip, training determinism across partitionings, compression
  * on a piece-rich corpus, char-retention through pruning, and
  * stored-table probe == fresh model. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the maximum-likelihood segmentation; ties to the longer piece") {
    val pieces = Map("a" -> -1.0, "b" -> -1.0, "c" -> -1.0,
      "ab" -> -1.5, "abc" -> -2.0, "x" -> -1.0, "y" -> -1.0, "xy" -> -2.0)
    val (s1, lp1) = UnigramLm.viterbi("abc", pieces, 8)
    assert(s1.toSeq == Seq("abc") && math.abs(lp1 - (-2.0)) < 1e-12)
    val (s2, lp2) = UnigramLm.viterbi("abab", pieces, 8)
    assert(s2.toSeq == Seq("ab", "ab") && math.abs(lp2 - (-3.0)) < 1e-12)
    // -2.0 ("xy") ties -2.0 ("x"+"y"): the longer final piece wins
    val (s3, _) = UnigramLm.viterbi("xy", pieces, 8)
    assert(s3.toSeq == Seq("xy"))
    // maxPieceLen clamps candidates even when a longer piece exists
    val (s4, _) = UnigramLm.viterbi("abc", pieces, 2)
    assert(s4.toSeq == Seq("ab", "c"))
  }

  test("unseen characters fall back to finite-logprob singletons; round-trip exact") {
    val pieces = Map("a" -> -1.0, "b" -> -1.0)
    val (segs, lp) = UnigramLm.viterbi("aqb", pieces, 8)
    assert(segs.toSeq == Seq("a", "q", "b"))
    assert(math.abs(lp - (-2.0 + UnigramLm.UnkLogProb)) < 1e-12)
    assert(segs.mkString == "aqb")
  }

  test("full EM: forward-backward marginals exact on a hand lattice, hard EM winner-takes-all") {
    // "abc" under uniform log(1/5) pieces {ab, bc, a, b, c}: three
    // segmentations [ab,c] (w=1/25), [a,bc] (1/25), [a,b,c] (1/125),
    // Z = 11/125. Hand marginals: ab=bc=5/11, a=c=6/11, b=1/11.
    val probs = Seq("ab", "bc", "a", "b", "c").map(_ -> math.log(1.0 / 5)).toMap
    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    UnigramLm.marginalCounts("abc", 1.0, probs, 8, acc)
    def close(x: Double, y: Double) = math.abs(x - y) < 1e-9
    assert(close(acc("ab"), 5.0 / 11), s"ab: ${acc.get("ab")}")
    assert(close(acc("bc"), 5.0 / 11))
    assert(close(acc("a"), 6.0 / 11))
    assert(close(acc("b"), 1.0 / 11))
    assert(close(acc("c"), 6.0 / 11))
    // weights scale linearly and total expected pieces = weighted path length
    val acc7 = scala.collection.mutable.HashMap.empty[String, Double]
    UnigramLm.marginalCounts("abc", 7.0, probs, 8, acc7)
    acc.foreach { case (p, v) => assert(close(acc7(p), 7 * v)) }
    assert(close(acc.values.sum, 23.0 / 11))
    // the hard E-step on the same tie puts ALL count on one path — the
    // exact divergence full EM exists to remove
    val (segs, _) = UnigramLm.viterbi("abc", probs, 8)
    assert(segs.toSeq == Seq("a", "bc"))
    // end-to-end: full-EM training is deterministic and yields a valid
    // model (encode round-trips); default (hard) training is untouched
    val docs = (0L until 40L).map(i =>
      (i, s"banana band ${i % 5} bandana")).toDF("doc_id", "text")
    val f1 = UnigramLm.train(docs, vocabSize = 30, fullEm = true)
    val f2 = UnigramLm.train(docs.repartition(5), vocabSize = 30, fullEm = true)
    assert(f1.pieces == f2.pieces)
    val enc = UnigramLm.encode(f1, docs).agg(sum(size(col("tokens")))).head.getLong(0)
    assert(enc > 0)
  }

  test("training is deterministic across partitionings and keeps every character") {
    val docs = (0L until 60L).map(i =>
      (i, s"the banana band ran ${i % 7} bandana bana rand")).toDF("doc_id", "text")
    val m1 = UnigramLm.train(docs.repartition(1), vocabSize = 40)
    val m2 = UnigramLm.train(docs.repartition(7, col("doc_id")), vocabSize = 40)
    assert(m1.pieces == m2.pieces)
    val chars = docs.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.replaceAll("[^a-z0-9]", "")).map(_.toString).toSet
    assert(chars.forall(m1.pieces.contains), "every corpus char survives pruning")
    // pruning respects the budget (chars are never pruned, so the
    // floor is the character inventory itself)
    assert(m1.pieces.size <= math.max(40, chars.size))
  }

  test("learned pieces compress a repetitive corpus; encode covers the word stream") {
    val docs = (0L until 80L).map(i =>
      (i, "interstellar international internet " + ("banana " * 5))).toDF("doc_id", "text")
    val model = UnigramLm.train(docs, vocabSize = 60)
    val stats = UnigramLm.tokenStatsWith(model, docs)
      .select("doc_id", "n_chars", "n_pieces", "compression", "logprob")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(stats.forall(_._4 > 1.3), "multi-char pieces must pay for themselves")
    assert(stats.forall(s => s._5 < 0 && !s._5.isInfinite))
    // token stream exactly covers the pre-tokenized words
    val enc = UnigramLm.encode(model, docs.limit(1)).select("tokens")
      .as[Seq[String]].head().mkString
    val words = java.util.regex.Pattern
      .compile(graft.operators.TextAnalysis.bpeishPattern)
      .matcher("interstellar international internet " + ("banana " * 5))
    val sb = new StringBuilder
    while (words.find()) sb.append(words.group())
    assert(enc == sb.toString)
  }

  test("stored piece table probes byte-identically to the fresh model") {
    val docs = (0L until 40L).map(i =>
      (i, s"streaming streams streamed stream ${i % 5}")).toDF("doc_id", "text")
    val model = UnigramLm.train(docs, vocabSize = 50)
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram").toString
    UnigramLm.save(spark, model, dir)
    val loaded = UnigramLm.load(spark, dir)
    assert(loaded.maxPieceLen == model.maxPieceLen)
    val fresh = UnigramLm.tokenStatsWith(model, docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val stored = UnigramLm.tokenStatsWith(loaded, docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // natural column order: (doc_id, n_chars, n_pieces, logprob,
    // compression). Segmentations and counts must be identical; the
    // per-doc logprob SUM may drift at the 6th dp because the stored
    // table rounds each piece's logprob to 6dp before the sum.
    fresh.zip(stored).foreach { case (f, s) =>
      assert(f._1 == s._1 && f._2 == s._2 && f._3 == s._3 && f._5 == s._5)
      assert(math.abs(f._4 - s._4) < 1e-3, s"logprob drift: ${f._4} vs ${s._4}")
    }
  }

  test("encodeStats === the piece-array reduction (stats never drift from encode)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val model = UnigramLm.train(docs, vocabSize = 300)
    val fromArrays = UnigramLm.encode(model, docs).orderBy("doc_id")
      .as[(Long, Seq[String], Double)].collect()
      .map { case (id, toks, lp) =>
        (id, toks.map(_.length.toLong).sum, toks.size.toLong, lp)
      }.toSeq
    val fast = UnigramLm.encodeStats(model, docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(fast == fromArrays)
  }
}
