package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, ShardExport}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("shard export: windows round-trip the corpus token stream in order") {
    val model = Bpe.train(docs, numMerges = 150)
    val enc = Bpe.encode(model, docs)
    val vocab = ShardExport.vocabulary(enc)
      .as[(String, Int)].collect().toMap
    val budget = 64L
    val wins = ShardExport.windows(enc, ShardExport.vocabulary(enc),
        budget, windowsPerShard = 8)
      .orderBy("seq_id")
      .select("shard_id", "seq_id", "input_ids", "n_tokens", "n_docs")
      .as[(Long, Long, Seq[Int], Long, Long)].collect()
    // the reference stream: per-doc tokens in doc_id order, through the
    // same vocabulary
    val expected = Bpe.encode(model, docs).orderBy("doc_id")
      .as[(Long, Seq[String])].collect()
      .flatMap(_._2).map(vocab)
    val flat = wins.flatMap(_._3)
    assert(flat.sameElements(expected), "window concat != corpus token stream")
    // seq_ids are dense from 0; every window but the last is exactly full
    assert(wins.map(_._2).sameElements(wins.indices.map(_.toLong)))
    assert(wins.init.forall(w => w._3.size == budget && w._4 == budget))
    assert(wins.last._3.size == wins.last._4 && wins.last._4 <= budget)
    // shard grouping is seq_id arithmetic; some window spans >=2 docs
    assert(wins.forall(w => w._1 == w._2 / 8))
    assert(wins.exists(_._5 >= 2), "expected a doc-spanning window at this budget")
  }

  test("shard export + manifest: deterministic receipt, consistent with windows") {
    val model = Bpe.train(docs, numMerges = 150)
    val enc = Bpe.encode(model, docs)
    val vocab = ShardExport.vocabulary(enc)
    val wins = ShardExport.windows(enc, vocab, budget = 64, windowsPerShard = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val man = ShardExport.export(wins, dir)
      .orderBy("shard_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the manifest read back from the exported files equals the one
    // computed from the in-flight windows — the export lost nothing
    val direct = ShardExport.manifest(wins).orderBy("shard_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(man == direct && man.nonEmpty)
    // full shards carry exactly windowsPerShard windows
    assert(man.init.forall(_._2 == 8L))
    // and a second full run (fresh encode, fresh vocab) reproduces the
    // same receipt: the whole path is deterministic
    val again = ShardExport.manifest(ShardExport.windows(
        Bpe.encode(model, docs), ShardExport.vocabulary(Bpe.encode(model, docs)),
        budget = 64, windowsPerShard = 8))
      .orderBy("shard_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(again == man)
  }

  test("shard export: window-assignment join never broadcasts the doc-level side") {
    // the r16 sf10 OOM class: `assigned` is one row per DOC — corpus-
    // scaled, two-long rows that compress so well AQE's bytes estimate
    // can land under the broadcast threshold while the deserialized
    // build is driver-heap-sized (BENCH_SF10_R16 failed: corpus_shards).
    // The merge pin (ShardExport.windows) must hold on the EXECUTED
    // adaptive plan even at this tiny SF, where AQE would otherwise
    // legitimately broadcast — exactly the conversion the pin forbids.
    // The vocabulary broadcast (join on `token`) is expected: BPE
    // bounds its size by construction.
    val model = Bpe.train(docs, numMerges = 150)
    val enc = Bpe.encode(model, docs)
    val wins = ShardExport.windows(enc, ShardExport.vocabulary(enc),
      budget = 64, windowsPerShard = 8)
    wins.collect() // finalize the adaptive plan before inspecting it
    val nodes = executedNodes(wins.queryExecution.executedPlan)
    val bhjKeys = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.leftKeys.flatMap(_.references.map(_.name.toLowerCase))
    }
    assert(!bhjKeys.exists(_.contains("doc_id")),
      s"doc-level assignment join must not broadcast (keys: $bhjKeys)")
    val smjKeys = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.flatMap(_.references.map(_.name.toLowerCase))
    }
    assert(smjKeys.exists(_.contains("doc_id")),
      s"doc-level assignment join must stay sort-merge (SMJ keys: $smjKeys)")
    assert(bhjKeys.exists(_.contains("token")),
      s"vocabulary join should broadcast (BHJ keys: $bhjKeys)")
  }

  test("bpe train: deterministic, valid contiguous ranks, count-ordered") {
    val m1 = Bpe.train(docs, numMerges = 100)
    val m2 = Bpe.train(docs, numMerges = 100)
    assert(m1.merges == m2.merges, "training must be deterministic")
    assert(m1.merges.nonEmpty && m1.merges.size <= 100)
    // no duplicate rules, and every merged symbol is left+right by
    // construction (mergesDF materializes that invariant)
    assert(m1.merges.distinct.size == m1.merges.size)
    val df = Bpe.mergesDF(spark, m1).collect()
    assert(df.map(_.getLong(0)).toSeq == (0L until m1.merges.size).toSeq)
    assert(df.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
    // the word-soup corpus has few distinct words: the capped histogram
    // must be the WHOLE histogram here (cap only bites at real scale)
    assert(m1.cappedWords == m1.totalWords && m1.cappedMass == m1.totalMass)
  }

  test("bpe encode: round-trips the pre-tokenized text exactly") {
    val model = Bpe.train(docs, numMerges = 150)
    val enc = Bpe.encode(model, docs).as[(Long, Array[String])].collect().toMap
    val pretok = docs.select(col("doc_id"),
        regexp_extract_all(col("text"),
          lit(graft.operators.TextAnalysis.bpeishPattern), lit(0)).as("w"))
      .as[(Long, Seq[String])].collect().toMap
    assert(enc.nonEmpty && enc.keySet == pretok.keySet)
    enc.foreach { case (id, toks) =>
      // stripping the end-of-word markers and concatenating must
      // reproduce the concatenated pre-tokens — no characters lost,
      // none invented, regardless of which merges fired
      val decoded = toks.map(_.replace(Bpe.EndOfWord, "")).mkString
      assert(decoded == pretok(id).mkString, s"doc $id round-trip")
      // every word contributes exactly one end-of-word marker
      assert(toks.count(_.endsWith(Bpe.EndOfWord)) == pretok(id).size)
    }
  }

  test("bpe compression: more merges never lengthen the encoding") {
    val m50 = Bpe.train(docs, numMerges = 50)
    val m200 = Bpe.train(docs, numMerges = 200)
    // greedy BPE merge lists are prefix-stable: the first 50 rules of
    // the 200-rule model ARE the 50-rule model
    assert(m200.merges.take(m50.merges.size) == m50.merges)
    val t50 = Bpe.encode(m50, docs).select(col("doc_id"), size(col("tokens")))
      .as[(Long, Int)].collect().toMap
    val t200 = Bpe.encode(m200, docs).select(col("doc_id"), size(col("tokens")))
      .as[(Long, Int)].collect().toMap
    assert(t200.keySet == t50.keySet)
    assert(t200.forall { case (id, n) => n <= t50(id) })
    assert(t200.values.sum < t50.values.sum, "extra merges must pay somewhere")
    // and the per-doc stats entry agrees with a direct char count
    val stats = Bpe.tokenStats(docs, numMerges = 200)
      .select("doc_id", "n_base_symbols", "n_bpe_tokens")
      .as[(Long, Long, Long)].collect()
    val chars = docs.select(col("doc_id"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long"))
      .as[(Long, Long)].collect().toMap
    stats.foreach { case (id, base, bpe) =>
      assert(base == chars(id), s"doc $id base symbols = non-ws chars")
      assert(bpe == t200(id).toLong)
    }
  }

  test("bpe save/load round-trip encodes identically") {
    val model = Bpe.train(docs, numMerges = 80)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Bpe.save(spark, model, dir)
    val back = Bpe.load(spark, dir)
    assert(back.merges == model.merges)
    assert(back.totalMass == model.totalMass &&
      back.cappedWords == model.cappedWords)
    val a = Bpe.encode(model, docs).select(col("doc_id"), concat_ws(" ", col("tokens")))
      .as[(Long, String)].collect().sorted.toSeq
    val b = Bpe.encode(back, docs).select(col("doc_id"), concat_ws(" ", col("tokens")))
      .as[(Long, String)].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("bpe vocab cap: measured, not silent — and merges still valid") {
    // force the cap to bite: 8 words max on a corpus with many more
    val model = Bpe.train(docs, numMerges = 30, maxVocabWords = 8)
    assert(model.cappedWords == 8 && model.totalWords > 8)
    assert(model.cappedMass < model.totalMass)
    // encoding still round-trips: merges learned on the capped
    // histogram apply wherever they match, unseen words fall back to
    // base symbols
    val enc = Bpe.encode(model, docs.limit(20))
      .as[(Long, Array[String])].collect()
    val pretok = docs.limit(20).select(col("doc_id"),
        regexp_extract_all(col("text"),
          lit(graft.operators.TextAnalysis.bpeishPattern), lit(0)).as("w"))
      .as[(Long, Seq[String])].collect().toMap
    enc.foreach { case (id, toks) =>
      assert(toks.map(_.replace(Bpe.EndOfWord, "")).mkString == pretok(id).mkString)
    }
  }

  test("tokenizer coverage: fertility >= 1, totals agree with tokenStats, OOV pool degrades") {
    val model = Bpe.train(docs, numMerges = 200)
    val cov = Bpe.tokenizerCoverage(model, docs)
      .orderBy("lang").collect()
    assert(cov.nonEmpty)
    cov.foreach { r =>
      val (words, toks) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"))
      assert(words > 0 && toks >= words, "BPE merges never cross words")
      assert(r.getAs[Double]("fertility") >= 1.0)
      val uf = r.getAs[Double]("unmerged_frac")
      assert(uf >= 0.0 && uf <= 1.0)
      assert(r.getAs[Double]("chars_per_token") >= 1.0)
    }
    // group sums reconcile with the per-doc stats path (shared encoder)
    val tok = Bpe.tokenStatsWith(model, docs)
      .agg(sum("n_bpe_tokens"), sum("n_base_symbols"))
      .as[(Long, Long)].head()
    assert(cov.map(_.getAs[Long]("n_tokens")).sum == tok._1)
    assert(cov.map(_.getAs[Long]("n_base_symbols")).sum == tok._2)
    // a vocabulary the model never saw must fall back to characters
    // harder than the training corpus does
    val oov = Seq((900001L, "xq", "zyxwvut qponml kjihgf xqzzyy wvutsrq"))
      .toDF("doc_id", "lang", "text")
    val covOov = Bpe.tokenizerCoverage(model, oov).collect()(0)
    val trainUf = cov.map(_.getAs[Double]("unmerged_frac")).max
    assert(covOov.getAs[Double]("unmerged_frac") > trainUf)
  }

  test("stored-merge encoding agrees with the train-then-encode form (text_bpe_stored)") {
    // the probe entry's contract: a merge table saved at release time
    // and reloaded later must produce byte-identical per-doc stats to
    // training in-flight — train once, encode forever.
    val model = Bpe.train(docs, numMerges = 200)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_store").toString
    Bpe.save(spark, model, dir)
    val loaded = Bpe.load(spark, dir)
    assert(loaded.merges == model.merges)
    assert(loaded.cappedMass == model.cappedMass &&
      loaded.totalMass == model.totalMass)
    val stored = Bpe.tokenStatsWith(loaded, docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val inflight = Bpe.tokenStats(docs, numMerges = 200).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(stored == inflight)
  }

  test("encodeStats === the token-array reduction (stats never drift from encode)") {
    val model = Bpe.train(docs, numMerges = 150)
    val symLen = (t: String) =>
      if (t.endsWith(Bpe.EndOfWord)) t.length - Bpe.EndOfWord.length else t.length
    val fromArrays = Bpe.encode(model, docs).orderBy("doc_id")
      .as[(Long, Seq[String])].collect()
      .map { case (id, toks) =>
        (id, toks.size.toLong, toks.map(t => symLen(t).toLong).sum,
          toks.count(t => symLen(t) <= 1).toLong)
      }.toSeq
    val fast = Bpe.encodeStats(model, docs).orderBy("doc_id")
      .select("doc_id", "n_bpe_tokens", "n_base_symbols", "n_unmerged")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(fast == fromArrays)
    // and n_words matches the pre-tokenizer count
    val words = docs.select(col("doc_id"),
        size(graft.expressions.TokenExpressions.bpeishTokens(col("text"))).cast("long"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val fastWords = Bpe.encodeStats(model, docs).orderBy("doc_id")
      .select("doc_id", "n_words").as[(Long, Long)].collect().toSeq
    assert(fastWords == words)
    // surrogate pairs: the unit contract is UTF-16 units (baseSymbols'
    // per-Java-char alphabet) — a supplementary-plane character is TWO
    // base symbols on both the stats and the array-reduction path
    val clef = new String(Character.toChars(0x1D11E)) // MUSICAL SYMBOL G CLEF
    val sDocs = Seq((1L, s"$clef$clef a $clef"), (2L, s"ab$clef ba"))
      .toDF("doc_id", "text")
    val sModel = Bpe.train(sDocs, numMerges = 10)
    val sFast = Bpe.encodeStats(sModel, sDocs).orderBy("doc_id")
      .select("doc_id", "n_bpe_tokens", "n_base_symbols", "n_unmerged")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val sRef = Bpe.encode(sModel, sDocs).orderBy("doc_id")
      .as[(Long, Seq[String])].collect()
      .map { case (id, toks) =>
        (id, toks.size.toLong, toks.map(t => symLen(t).toLong).sum,
          toks.count(t => symLen(t) <= 1).toLong)
      }.toSeq
    assert(sFast == sRef)
    assert(sFast.head._3 >= 4L, // doc 1's clefs alone contribute 2 units each
      s"supplementary char must count 2 UTF-16 base symbols: $sFast")
  }
}
