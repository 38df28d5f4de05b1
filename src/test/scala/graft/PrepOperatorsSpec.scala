package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Contamination, Funnel, Packing, Privacy, Selection, Splits, TextAnalysis}

/** Round-5 corpus-prep operators: repetition signals, decontamination,
  * mixture sampling, sequence packing, CDC/SCD2, k-anonymity. */
class PrepOperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ selection
  test("budget selection keeps exactly the greedy quality-ordered token prefix") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    // local reference: full sort by (quality desc, id), strict prefix
    val ref = TextAnalysis.qualityScore(docs)
      .where(col("n_chars_calc") > 0 && col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens").cast("long"), col("quality_score"))
      .as[(Long, Long, Double)].collect()
      .sortBy { case (id, _, q) => (-q, id) }
    val budget = ref.map(_._2).sum / 3 // a real cut: ~third of the corpus
    val expected = ref.scanLeft((0L, 0L, 0.0, 0L)) {
        case ((_, _, _, cum), (id, t, q)) => (id, t, q, cum + t)
      }.tail.takeWhile(_._4 <= budget)
    val got = Selection.selectByBudget(docs, budget)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Long)].collect()
    assert(got.sortBy(r => (-r._3, r._1)).toSeq == expected.toSeq)
    assert(got.forall(_._4 <= budget) && got.nonEmpty)
    // strictness: the next doc in quality order would overflow
    assert(ref.length > expected.length &&
      expected.last._4 + ref(expected.length)._2 > budget)
    // few buckets (forces multi-doc buckets + a frontier mid-bucket)
    // must agree with many buckets
    val coarse = Selection.selectByBudget(docs, budget, buckets = 4)
      .orderBy("doc_id").as[(Long, Long, Double, Long)].collect()
    assert(coarse.toSeq == got.toSeq)
  }

  // ------------------------------------------------------------ snapshot diff
  test("funnel attrition: first-stage-wins attribution, volumes partition the corpus") {
    val rows = Seq(
      (1L, "zz", 5L),             // fails stage 1
      (2L, "good enough doc", 15L),
      (3L, "good enough doc", 15L), // dup of 2 -> dup stage
      (4L, "zz", 2L),             // fails stage 1 AND is a dup -> stage 1 wins
      (5L, "another fine doc", 16L)
    ).toDF("doc_id", "text", "n_chars")
    import org.apache.spark.sql.expressions.Window
    val base = rows.withColumn("__rk",
      row_number().over(Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
    val out = Funnel.attrition(base, Seq(
        "too_short" -> (col("n_chars") < 10),
        "is_dup" -> (col("__rk") > 1)),
      volumes = Seq("chars" -> col("n_chars")))
      .collect().map(r => r.getString(1) ->
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("too_short") == (0L, 2L, 7L, 0.4))   // docs 1 (wins over dup) + 4
    assert(out("is_dup") == (1L, 1L, 15L, 0.2))     // doc 3 only
    assert(out("kept") == (2L, 2L, 31L, 0.4))       // docs 2, 5
    assert(out.values.map(_._2).sum == 5, "stages must partition the corpus")
    assert(out.values.map(_._4).sum == 1.0, "shares must sum to 1")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged per key") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c-edited"), (4L, "d")).toDF("doc_id", "text")
    val out = Cdc.snapshotDiff(oldSnap, newSnap).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  // ------------------------------------------------------------ drift
  test("distributionDrift: shares sum to 1 per dim, vanished cells surface, TV matches hand calc") {
    val oldSnap = Seq((1L, "en", 100L), (2L, "en", 100L), (3L, "de", 100L),
      (4L, "fr", 100L)).toDF("doc_id", "lang", "n_chars")
    val newSnap = Seq((1L, "en", 100L), (2L, "en", 100L), (3L, "en", 100L),
      (4L, "de", 600L)).toDF("doc_id", "lang", "n_chars")
    val out = Cdc.distributionDrift(oldSnap, newSnap, Seq(
        "lang" -> col("lang"),
        "len_bucket" -> floor(col("n_chars") / 256).cast("long")))
      .orderBy("dim", "cell")
      .as[(String, String, Long, Long, Double, Double, Double)].collect()
    val lang = out.filter(_._1 == "lang").map(r => r._2 -> r).toMap
    // fr vanished entirely: must still appear with a zero new side
    assert(lang("fr")._4 == 0L && lang("fr")._7 == 0.25)
    assert(lang("en")._7 == 0.25 && lang("de")._7 == 0.0)
    // shares are true distributions on both sides of every dimension
    for (dim <- Seq("lang", "len_bucket")) {
      val rows = out.filter(_._1 == dim)
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-9, s"$dim old shares")
      assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-9, s"$dim new shares")
    }
    // TV distance of the lang dim = (0.25 + 0.0 + 0.25) / 2 = 0.25
    assert(out.filter(_._1 == "lang").map(_._7).sum / 2 == 0.25)
    // the length dim sees doc 4 move buckets 0 -> 2: bucket 0 share
    // 1.0 -> 0.75, bucket 2 appears at 0.25
    val lb = out.filter(_._1 == "len_bucket").map(r => r._2 -> r._7).toMap
    assert(lb("0") == 0.25 && lb("2") == 0.25)
  }

  // ------------------------------------------------------------ leakage-safe split
  test("leakageSafe split: clusters move as one unit, singletons match byHash") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val pairs = graft.operators.Dedup.minhashNearDups(docs, threshold = 0.8)
    val out = Splits.leakageSafe(docs, pairs, "doc_id")
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    assert(out.length == docs.count())
    // every cluster is split-pure: one distinct split per cluster_id
    val perCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perCluster.values.forall(_.size == 1))
    // paired docs exist at this sf and at least one cluster spans docs
    // whose INDEPENDENT byHash assignments would disagree — the operator
    // must have moved one of them (otherwise the test proves nothing)
    val byHash = Splits.byHash(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val clustered = out.filter(r => r._1 != r._2)
    assert(clustered.nonEmpty, "testdata must contain near-dup clusters")
    // singletons (cluster_id == own id) agree with plain byHash exactly
    out.filter(r => r._1 == r._2).foreach { case (id, _, s) =>
      assert(s == byHash(id), s"singleton $id moved: $s vs ${byHash(id)}")
    }
  }

  // ------------------------------------------------------------ repetition
  test("repetition signals on degenerate vs healthy text") {
    val docs = Seq(
      (1L, "a a a a a a a a a a"), // pure loop
      (2L, "the quick brown fox jumps over one lazy dog today friend"), // all distinct
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs)
      .select("doc_id", "n_words", "n_uniq_words", "uniq_word_ratio",
        "top_bigram_frac", "dup_trigram_frac", "repetitive")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double, Double, Boolean)].collect()
    // doc 1: 10 words, 1 uniq; 9 bigrams all "a a"; 8 trigram occurrences, 1 distinct
    assert(out(0) == ((1L, 10L, 1L, 0.1, 1.0, 0.875, true)))
    // doc 2: 11 distinct words, 10 distinct bigrams -> top frac 0.1
    assert(out(1)._2 == 11L && out(1)._3 == 11L)
    assert(out(1)._4 == 1.0 && out(1)._5 == 0.1 && out(1)._6 == 0.0)
    assert(!out(1)._7)
    // empty doc: all zero ratios, not flagged
    assert(out(2) == ((3L, 0L, 0L, 0.0, 0.0, 0.0, false)))
  }

  test("repetition packed-id kernel === string-keyed reference on the real corpus") {
    // r20: bigrams/trigrams count via interned ids packed into longs;
    // this pins the kernel to the original concat-string identity on
    // every doc of the oracle SF plus crafted edge docs.
    val real = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text")
    val edge = Seq(
      (900001L, "x y x y x y x"),        // alternating bigram tie
      (900002L, "a b c a b c a b c"),    // repeated trigram loop
      (900003L, "one two"),              // below trigram length
      (900004L, "solo"),                 // single word
      (900005L, "a1 b2 a1 b2 c3 a1")     // digit tokens
    ).toDF("doc_id", "text")
    val docs = real.unionByName(edge)
    val out = TextAnalysis.repetitionSignals(docs)
      .select("doc_id", "n_words", "n_uniq_words", "n_bigrams",
        "top_bigram_n", "n_trigrams", "n_uniq_trigrams")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val ref = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val toks = graft.expressions.TokenScan.lowerAlnum(text)
        val n = toks.length
        val uniq = toks.toSet.size
        val bigrams = toks.sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSeq
        val top = if (bigrams.isEmpty) 0L
          else bigrams.groupBy(identity).values.map(_.size).max.toLong
        val trigrams = toks.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSeq
        id -> ((id, n.toLong, uniq.toLong, math.max(n - 1, 0).toLong,
          top, math.max(n - 2, 0).toLong, trigrams.distinct.size.toLong))
      }.toMap
    ref.foreach { case (id, expect) =>
      assert(out(id) == expect, s"doc $id: ${out(id)} vs $expect")
    }
  }

  // -------------------------------------------------------- decontamination
  test("decontamination flags 8-gram overlap with the benchmark") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"prefix words here $shared suffix tail"),
      (2L, "totally unrelated content with many different words going on here"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"benchmark question: $shared answer"))
      .toDF("doc_id", "text")
    val out = Contamination.flagOverlap(corpus, bench, n = 8)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect()
    assert(out(0)._1 == 1L && out(0)._2 >= 1L && out(0)._3)
    assert(out(1) == ((2L, 0L, false)))
    val clean = Contamination.decontaminate(corpus, bench, n = 8)
    assert(clean.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("bloom-prefiltered decontamination equals the exact join path") {
    val all = spark.read.parquet(s"${sf()}/documents.parquet")
    val corpus = all.where($"doc_id" % 7 =!= 0)
    val bench = all.where($"doc_id" % 7 === 0)
    val exact = Contamination.flagOverlap(corpus, bench, n = 8)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(exact.exists(_._3) && exact.exists(!_._3), "fixture must mix both classes")
    // fpp=0.5 floods the prefilter with false positives; the exact-verify
    // stage must zero every one — equality at both ends certifies the
    // no-false-negative direction AND the verify stage
    for (fpp <- Seq(0.001, 0.5)) {
      val viaBloom = Contamination.flagOverlapBloom(corpus, bench, n = 8, fpp = fpp)
        .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
      assert(viaBloom == exact, s"bloom path diverged at fpp=$fpp")
    }
    val cleanExact = Contamination.decontaminate(corpus, bench, n = 8)
      .select("doc_id").as[Long].collect().toSeq.sorted
    val cleanBloom = Contamination.decontaminateBloom(corpus, bench, n = 8)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(cleanBloom == cleanExact)
  }

  test("stored benchmark index round-trips: indexed report equals direct") {
    val all = spark.read.parquet(s"${sf()}/documents.parquet")
    val corpus = all.where($"doc_id" % 7 =!= 0)
    val bench = all.where($"doc_id" % 7 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_benchidx").toString
    Contamination.buildBenchmarkIndex(bench, dir, n = 8)
    val direct = Contamination.flagOverlap(corpus, bench, n = 8)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    val indexed = Contamination.flagOverlapIndexed(corpus, dir)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(indexed == direct)
    // the meta table pins the gram width the index was shingled with
    assert(spark.read.parquet(s"$dir/meta").select("n").as[Int].head() == 8)
    // ...and the gram-key FORMAT: probing an index whose meta lacks (or
    // mismatches) the current format version must FAIL LOUDLY — a
    // long-vs-string key mismatch would otherwise silently report zero
    // contamination, passing contaminated docs
    assert(spark.read.parquet(s"$dir/meta").select("fmt").as[Int].head()
      == Contamination.GramKeyFormat)
    val oldDir = java.nio.file.Files.createTempDirectory("graft_benchidx_old").toString
    Contamination.buildBenchmarkIndex(bench, oldDir, n = 8)
    // simulate a pre-fmt index: rewrite meta without the fmt column
    spark.read.parquet(s"$oldDir/meta").select("n", "fpp")
      .write.mode("overwrite").parquet(s"$oldDir/meta_tmp")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$oldDir/meta"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$oldDir/meta_tmp"),
      new org.apache.hadoop.fs.Path(s"$oldDir/meta"))
    val e = intercept[IllegalArgumentException] {
      Contamination.flagOverlapIndexed(corpus, oldDir)
    }
    assert(e.getMessage.contains("gram-key format"), e.getMessage)
  }

  test("bloom prefilter economics: suspects ⊇ contaminated, FP-sliver-sized") {
    val all = spark.read.parquet(s"${sf()}/documents.parquet")
    val corpus = all.where($"doc_id" % 7 =!= 0)
    val bench = all.where($"doc_id" % 7 === 0)
    val contaminated = Contamination.flagOverlap(corpus, bench, n = 8)
      .where($"contaminated").select("doc_id").as[Long].collect().toSet
    val suspects = Contamination
      .bloomSuspects(corpus, bench, n = 8, "doc_id", "text", fpp = 1e-6)
      .as[Long].collect().toSet
    // no false negatives: every truly contaminated doc is a suspect
    assert(contaminated.subsetOf(suspects))
    // the prefilter prunes: false suspects are union-bounded by
    // grams-per-doc x fpp ~ 0 at 1e-6 here, so the verify stage sees
    // (essentially) only real contamination, and the clean majority
    // provably never joins
    assert(suspects.size <= contaminated.size + 2,
      s"${suspects.size} suspects vs ${contaminated.size} contaminated")
    val corpusDocs = corpus.count()
    assert(suspects.size < corpusDocs / 2,
      s"prefilter pruned nothing: ${suspects.size} of $corpusDocs docs")
  }

  test("attribution names the benchmark doc with the most shared n-grams") {
    val g1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val g2 = "one two three four five six seven eight"
    val corpus = Seq((1L, s"$g1 and also $g2 trailing words here")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, s"$g1 plus other stuff"),  // shares 3 distinct 8-grams of g1
      (200L, s"only $g2 here"))         // shares 1
      .toDF("doc_id", "text")
    val out = Contamination.attributeOverlap(corpus, bench, n = 8)
      .select("doc_id", "bench_id", "shared_ngrams")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.length == 1)
    assert(out.head._1 == 1L && out.head._2 == 100L)
    assert(out.head._3 > 1L)
    // tie-break: equal shared counts resolve to the SMALLEST bench id
    // (r20 pins the struct-max argmax to the old window's ordering)
    val benchTie = Seq(
      (300L, s"$g2 padding tokens"),
      (100L, s"$g2 other padding"))
      .toDF("doc_id", "text")
    val corpusTie = Seq((1L, s"exact copy of $g2 once")).toDF("doc_id", "text")
    val tied = Contamination.attributeOverlap(corpusTie, benchTie, n = 8)
      .select("doc_id", "bench_id", "shared_ngrams")
      .as[(Long, Long, Long)].collect().toSeq
    assert(tied == Seq((1L, 100L, 1L)), s"tie must pick min bench_id: $tied")
  }

  test("attribution kernel equals the gram-join reference on a real slice") {
    // r20: attributeOverlap dispatches small bench sides to a
    // broadcast-postings scan kernel. Pin its output against the r19
    // join + struct-max form, spelled out here as the reference, on a
    // real testdata slice (the %7 split the declared query uses).
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = all.where(col("doc_id") % 7 =!= 0)
    val bench = all.where(col("doc_id") % 7 === 0)
    val kernel = Contamination.attributeOverlap(corpus, bench, n = 8)
      .select("doc_id", "bench_id", "shared_ngrams")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val corpusGrams = Contamination.ngramHashes(corpus, 8)
    val benchGrams = Contamination.ngramHashes(bench, 8)
      .select(col("doc_id").as("bench_id"), col("gram")).distinct()
    val reference = corpusGrams.join(benchGrams, "gram")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("shared_ngrams"))
      .groupBy("doc_id")
      .agg(max(struct(col("shared_ngrams"), (-col("bench_id")).as("nb"),
        col("bench_id"))).as("__top"))
      .select(col("doc_id"), col("__top.bench_id").as("bench_id"),
        col("__top.shared_ngrams").as("shared_ngrams"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(kernel.nonEmpty, "slice produced no contaminated docs")
    assert(kernel == reference)
  }

  test("curriculum phases tier by the score's own quantiles") {
    val df = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val out = Splits.curriculumPhases(df, "score", phases = 3)
      .select("id", "phase").orderBy("id").as[(Long, Long)].collect().toSeq
    // q33 ~ 3.67, q66 ~ 6.33 -> 1-3 phase0, 4-6 phase1, 7-9 phase2
    assert(out.map(_._2) == Seq(0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L, 2L))
  }

  // ------------------------------------------------------- mixture sampling
  test("mixture sampling: rates from counts, deterministic membership") {
    val docs = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("id", "domain")
    val weights = Seq("src0" -> 0.6, "src1" -> 0.4) // src2 dropped
    val out = Splits.mixture(docs, "id", "domain", weights, budget = 50.0)
    val kept = out.select("id", "domain").as[(Long, String)].collect().toSet
    assert(kept.forall(_._2 != "src2"))
    // rate for src0 = min(1, 50*0.6/100) = 0.3; src1 = 0.2
    val rates = out.select("domain", "rate").distinct().as[(String, Double)]
      .collect().toMap
    assert(math.abs(rates("src0") - 0.3) < 1e-12)
    assert(math.abs(rates("src1") - 0.2) < 1e-12)
    // deterministic: same call -> same membership
    val again = Splits.mixture(docs, "id", "domain", weights, budget = 50.0)
      .select("id", "domain").as[(Long, String)].collect().toSet
    assert(again == kept)
    // budget larger than domain size -> rate caps at 1.0, all kept
    val all = Splits.mixture(docs, "id", "domain", Seq("src0" -> 1.0), budget = 1000.0)
    assert(all.count() == 100)
  }

  test("temperature mixture: alpha=0 flattens to uniform targets, tail upsampled") {
    // skewed composition: 200 / 80 / 20
    val docs = (0L until 300L).map { i =>
      val d = if (i < 200) "head" else if (i < 280) "mid" else "tail"
      (i, d)
    }.toDF("id", "domain")
    val out0 = Splits.mixtureTemperature(docs, "id", "domain", alpha = 0.0, budget = 90.0)
    val rates0 = out0.select("domain", "rate").distinct()
      .as[(String, Double)].collect().toMap
    // alpha=0: every target share is 1/3 (after 6dp decimal z), so
    // rate_i = round(min(1, 30/n_i), 6) modulo the decimal normalizer
    assert(math.abs(rates0("head") - 0.15) < 1e-5)
    assert(math.abs(rates0("mid") - 0.375) < 1e-5)
    assert(rates0("tail") == 1.0) // 30/20 caps at 1 -> all 20 kept
    assert(out0.where($"domain" === "tail").count() == 20)
    // 0 < alpha < 1: tail keeps a larger FRACTION than head (upsampling)
    val out3 = Splits.mixtureTemperature(docs, "id", "domain", alpha = 0.3, budget = 90.0)
    val rates3 = out3.select("domain", "rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates3("tail") > rates3("mid") && rates3("mid") > rates3("head"))
    // alpha=1 reproduces the corpus's own shares: equal keep rates
    val out1 = Splits.mixtureTemperature(docs, "id", "domain", alpha = 1.0, budget = 90.0)
    val rates1 = out1.select("rate").distinct().as[Double].collect()
    assert(rates1.length == 1 && math.abs(rates1(0) - 0.3) < 1e-5)
    // deterministic membership under repartitioning
    val again = Splits.mixtureTemperature(docs.repartition(11), "id", "domain",
        alpha = 0.3, budget = 90.0)
      .select("id").as[Long].collect().toSet
    assert(again == out3.select("id").as[Long].collect().toSet)
  }

  test("stratified sample: exactly n per group, small groups whole, invariant") {
    val docs = (0L until 260L).map { i =>
      val g = if (i < 120) "a" else if (i < 250) "b" else "c" // c has 10 < n
      (i, g)
    }.toDF("doc_id", "grp")
    val out = Splits.sampleStratified(docs, n = 25, groupCol = "grp")
    val byGroup = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGroup("a") == 25 && byGroup("b") == 25 && byGroup("c") == 10)
    // membership is a pure function of (id, seed): partitioning-invariant
    val again = Splits.sampleStratified(docs.repartition(13), n = 25, groupCol = "grp")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // a different seed is a different (same-sized) pool
    val other = Splits.sampleStratified(docs, n = 25, groupCol = "grp", seed = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(other != again && other.size == again.size)
  }

  test("weighted sample: exact size, weight-proportional, deterministic, stored-table-identical") {
    val docs = (0L until 300L)
      .map(i => (i, if (i < 30) 50.0 else 0.5)) // 30 heavy docs, 270 light
      .toDF("doc_id", "w")
    val out = Splits.sampleWeighted(docs, n = 60, weightCol = "w")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.size == 60)
    // Efraimidis-Spirakis inclusion law: 100x-weighted docs all make a
    // 20% cut (P(miss) is astronomically small; deterministic per seed)
    assert((0L until 30L).forall(ids))
    // membership is a pure function of (id, weight, seed)
    val again = Splits.sampleWeighted(docs.repartition(13), n = 60, weightCol = "w")
      .select("doc_id").as[Long].collect().toSet
    assert(again == ids)
    val other = Splits.sampleWeighted(docs, n = 60, weightCol = "w", seed = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(other != ids && other.size == 60)
    // zero/negative weights can never be sampled
    val withDead = docs.union(Seq((900L, 0.0), (901L, -3.0)).toDF("doc_id", "w"))
    val deadOut = Splits.sampleWeighted(withDead, n = 300, weightCol = "w")
      .select("doc_id").as[Long].collect().toSet
    assert(!deadOut(900L) && !deadOut(901L) && deadOut.size == 300)
    // the stored-table probe path (parquet round-trip of the weights)
    // samples byte-identically — the corpus_sample_weighted_stored claim
    val dir = java.nio.file.Files.createTempDirectory("graft_wsamp").toString
    docs.write.mode("overwrite").parquet(dir)
    val stored = Splits.sampleWeighted(spark.read.parquet(dir), n = 60, weightCol = "w")
      .select("doc_id").as[Long].collect().toSet
    assert(stored == ids)
  }

  test("percentRank: SQL semantics with ties, no ordering dependence") {
    // values with tie groups; expected percent_rank = count_less/(n-1)
    val vals = Seq(0.1, 0.3, 0.3, 0.3, 0.7, 0.7, 0.9, 1.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = graft.operators.Sketches.percentRank(df, "v", "pr", 0.0, 1.0)
      .select("id", "pr").as[(Long, Double)].collect().toMap
    val n = vals.size
    vals.zipWithIndex.foreach { case (v, i) =>
      val expected = math.rint(vals.count(_ < v).toDouble / (n - 1) * 1e6) / 1e6
      assert(out(i.toLong) == expected, s"id $i value $v")
    }
    // partitioning-invariant
    val again = graft.operators.Sketches.percentRank(df.repartition(5), "v", "pr", 0.0, 1.0)
      .select("id", "pr").as[(Long, Double)].collect().toMap
    assert(again == out)
  }

  test("waterFill: fair level spends the budget, never exceeds a domain, fairness holds") {
    def doc(id: Long, dom: String, words: Int) =
      (id, dom, Seq.fill(words)("w").mkString(" "))
    val docs = (
      (0L until 10L).map(doc(_, "small", 5)) ++    // 50 tokens
      (10L until 20L).map(doc(_, "mid", 20)) ++    // 200 tokens
      (20L until 30L).map(doc(_, "big", 100))      // 1000 tokens
    ).toDF("doc_id", "domain", "text")
    // budget below everything: equal split, nobody satisfied... except
    // domains smaller than the equal share
    val out = Selection.waterFill(docs, "domain", budget = 400.0)
      .select("domain", "n_tokens", "satisfied", "allocated")
      .as[(String, Long, Boolean, Double)].collect()
      .map(r => r._1 -> r).toMap
    // level: small (50) satisfied since 3*50=150<=400; remaining 350/2=175
    assert(out("small") == (("small", 50L, true, 50.0)))
    assert(out("mid") == (("mid", 200L, false, 175.0)))
    assert(out("big") == (("big", 1000L, false, 175.0)))
    assert(math.abs(out.values.map(_._4).sum - 400.0) < 1e-6, "budget exactly spent")
    assert(out.values.forall(r => r._4 <= r._2 + 1e-9), "never exceeds a domain")
    // budget covers everything: every domain fully satisfied
    val all = Selection.waterFill(docs, "domain", budget = 5000.0)
      .select("satisfied").as[Boolean].collect()
    assert(all.forall(identity))
  }

  // -------------------------------------------------------- sequence packing
  test("sequence packing: known offsets and window spans") {
    val docs = Seq(
      (0L, "w w w"), (1L, "w w w w"), (2L, "w w w w w"), (3L, "w w"))
      .toDF("doc_id", "text")
    val out = Packing.packSequences(docs, budget = 5L)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect()
    assert(out(0) == ((0L, 3L, 0L, 0L, 1L)))
    assert(out(1) == ((1L, 4L, 0L, 3L, 2L))) // starts at 3, spans windows 0-1
    assert(out(2) == ((2L, 5L, 1L, 2L, 2L))) // starts at 7, spans 1-2
    assert(out(3) == ((3L, 2L, 2L, 2L, 1L))) // starts at 12
  }

  test("grouped packing equals independent per-group packing") {
    val docs = (0L until 120L)
      .map(i => (i, s"g${i % 3}", Seq.fill((i % 9 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "grp", "text")
    val grouped = Packing.packSequencesBy(docs, budget = 32L, Seq("grp"), buckets = 4)
    val perGroup = Seq("g0", "g1", "g2").map { g =>
      Packing.packSequences(docs.where(col("grp") === g), budget = 32L, buckets = 4)
        .withColumn("grp", lit(g))
    }.reduce(_ unionByName _)
    val mism = grouped.join(
        perGroup.withColumnRenamed("seq_id", "seq_id_exp"), Seq("grp", "doc_id"))
      .where(col("seq_id") =!= col("seq_id_exp"))
    assert(mism.count() == 0)
    assert(grouped.count() == 120)
  }

  test("best-fit packing: exactly-once, capacity, waste near lower bound") {
    val docs = (0L until 300L)
      .map(i => (i, Seq.fill(((i * 37) % 90 + 10).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val budget = 128L
    val packed = Packing.packBestFit(docs, budget, buckets = 4)
    val rows = packed.select("doc_id", "pack_len", "bin_id")
      .as[(Long, Long, Long)].collect()
    // every doc assigned exactly once
    assert(rows.length == 300 && rows.map(_._1).distinct.length == 300)
    // no bin over budget
    val fills = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(fills.values.forall(_ <= budget))
    // bin ids dense from 0 (strategy bases are exact)
    assert(fills.keySet == (0L until fills.size).toSet)
    // waste: within 15% of the ceil(total/budget) lower bound, and far
    // better than the one-doc-per-bin naive (padding-heavy) packing
    val total = rows.map(_._2).sum
    val lower = (total + budget - 1) / budget
    assert(fills.size >= lower)
    assert(fills.size <= (lower * 1.15).toLong + 1,
      s"${fills.size} bins vs lower bound $lower")
    assert(fills.size < 300)
    // deterministic
    val again = Packing.packBestFit(docs, budget, buckets = 4)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toSet
    assert(again == rows.map(r => (r._1, r._3)).toSet)
  }

  test("best-fit packing: clamps overlong docs, packs empty docs once") {
    val docs = Seq(
      (0L, Seq.fill(50)("w").mkString(" ")), // overlong: clamped to 16
      (1L, ""),                              // empty: packs as length 1
      (2L, "w w w w w"), (3L, "w w w w w w w w w w w")) // 5 + 11 = one bin
      .toDF("doc_id", "text")
    val out = Packing.packBestFit(docs, budget = 16L)
      .select("doc_id", "n_tokens", "pack_len", "clamped", "bin_id")
      .as[(Long, Long, Long, Boolean, Long)].collect().sortBy(_._1)
    assert(out(0) == ((0L, 50L, 16L, true, out(0)._5)))
    assert(out(1)._3 == 1L && !out(1)._4)
    // the clamped doc fills a whole bin alone; 11+5 share one; the
    // empty doc lands wherever 1 token still fits
    val fills = out.groupBy(_._5).view.mapValues(_.map(_._3).sum).toMap
    assert(fills.values.forall(_ <= 16L))
    assert(out(2)._5 == out(3)._5)
    assert(out.map(_._1).distinct.length == 4)
  }

  test("sequence packing: multi-bucket prefix sum equals a global cumsum") {
    import org.apache.spark.sql.expressions.Window
    val docs = (0L until 200L).map(i => (i * 3, s"t${i % 7}", ((i * 37) % 11 + 1).toInt))
      .map { case (id, _, n) => (id, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val packed = Packing.packSequences(docs, budget = 64L, buckets = 8)
    val naive = docs
      .withColumn("n_tokens", graft.functions.wsTokenCount(col("text")))
      .withColumn("start_off",
        coalesce(sum("n_tokens").over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), expr("start_off div 64L").as("seq_id_exp"))
    val joined = packed.join(naive, "doc_id")
    assert(joined.where(col("seq_id") =!= col("seq_id_exp")).count() == 0)
    assert(packed.count() == 200)
  }

  test("document chunking: spans cover every token exactly once") {
    val docs = Seq(
      (1L, Seq.fill(70)("w").mkString(" ")), // 70 tokens -> chunks 32/32/6
      (2L, "w w"),                           // 2 tokens  -> one chunk of 2
      (3L, ""))                              // empty     -> one empty chunk
      .toDF("doc_id", "text")
    val out = Packing.chunkDocuments(docs, budget = 32L)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_start", "chunk_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 32L), (1L, 1L, 32L, 32L), (1L, 2L, 64L, 6L),
      (2L, 0L, 0L, 2L),
      (3L, 0L, 0L, 0L)))
  }

  test("overlapping chunks: full coverage, exact overlap, no redundant tail, zero==plain") {
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(0, 1, 24, 25, 32, 33, 56, 57, 100).zipWithIndex
      .map { case (n, i) => (i.toLong, doc(n), n.toLong) }
      .toDF("doc_id", "text", "n")
    val out = Packing.chunkDocumentsOverlap(docs, budget = 32L, overlap = 8L)
      .select("doc_id", "n_tokens", "chunk_start", "chunk_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    out.foreach { case (id, chunks) =>
      val n = chunks.head._2
      // coverage: merged spans tile [0, n) with no gap
      var covered = 0L
      chunks.foreach { case (_, _, start, len) =>
        assert(start <= covered, s"doc $id: gap before $start")
        covered = math.max(covered, start + len)
      }
      assert(covered == n, s"doc $id covered $covered of $n")
      // stride is constant, so every consecutive pair shares exactly
      // `overlap` tokens (the final chunk may be short but still
      // starts inside fresh territory — never fully redundant)
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          val inter = math.min(a._3 + a._4, b._3 + b._4) - b._3
          assert(inter == 8L, s"doc $id overlap $inter")
          assert(b._3 + b._4 > a._3 + a._4, s"doc $id redundant tail")
        case _ => ()
      }
    }
    // 25 tokens: a second chunk at 24 would only re-cover overlap -> 1 chunk
    assert(out(3L).length == 1 && out(6L).length == 2 && out(7L).length == 3)
    // overlap = 0 degenerates to the plain chunker byte-for-byte
    val plain = Packing.chunkDocuments(docs, budget = 32L)
      .orderBy("doc_id", "chunk_id").collect().toSeq
    val zero = Packing.chunkDocumentsOverlap(docs, budget = 32L, overlap = 0L)
      .orderBy("doc_id", "chunk_id").collect().toSeq
    assert(zero == plain)
  }

  // ------------------------------------------------------------- CDC / SCD2
  test("changelog replay keeps latest non-deleted state per key") {
    val log = Seq(
      (1L, 1L, "I", 10.0), (1L, 2L, "U", 20.0),             // k1 -> 20.0
      (2L, 1L, "I", 5.0), (2L, 3L, "D", 0.0),               // k2 deleted
      (3L, 2L, "U", 7.0), (3L, 1L, "I", 6.0))               // k3 -> 7.0 (seq order)
      .toDF("k", "seq", "op", "v")
    val out = Cdc.applyChangeLog(log, Seq("k"), Seq("seq"))
      .select("k", "v").orderBy("k").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 20.0), (3L, 7.0)))
  }

  test("type-2 history collapses runs with validity intervals") {
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "A"),
      (2L, 1L, "X"))
      .toDF("k", "seq", "state")
    val out = Cdc.type2History(ev, Seq("k"), Seq("seq"), "state")
      .select("k", "state", "valid_from", "valid_to", "is_current", "n_events")
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean, Long)].collect()
    assert(out(0) == ((1L, "A", 1L, Some(3L), false, 2L)))
    assert(out(1) == ((1L, "B", 3L, Some(4L), false, 1L)))
    assert(out(2) == ((1L, "A", 4L, None, true, 1L)))
    assert(out(3) == ((2L, "X", 1L, None, true, 1L)))
  }

  test("incremental exact dedup drops history matches and within-batch dups") {
    val existing = Seq((1L, "already seen text"), (2L, "other old text"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "already seen text"),  // dup of history -> dropped
      (11L, "brand new text"),     // kept
      (12L, "brand new text"),     // within-batch dup of 11 -> dropped
      (13L, "another new one"))    // kept
      .toDF("doc_id", "text")
    val kept = graft.operators.Dedup.exactIncrement(existing, incoming)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L, 13L))
  }

  test("incremental near-dup dedup drops history-similar and within-batch-similar docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val existing = Seq((1L, base)).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base + " omicron"),        // near-dup of history -> dropped
      (11L, "completely different words in this one here now for sure today"),
      (12L, "completely different words in this one here now for sure tonight")) // near-dup of 11
      .toDF("doc_id", "text")
    val kept = graft.operators.Dedup.nearDupIncrement(existing, incoming, threshold = 0.6)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L))
  }

  test("unigram log-prob ranks fluent text above rare-token spam") {
    val docs = Seq(
      (1L, "common common common common words words words"),
      (2L, "zzqy xkfj qwpv mnbt"), // all-singleton tokens
      (3L, "common words")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs)
      .select("doc_id", "avg_logprob").orderBy("doc_id")
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L) && out(3L) > out(2L))
    // doc 1 = common x4 + words x3; p(common)=5/13, p(words)=4/13 over the
    // 13-token corpus; each ln(p) is fixed to 6dp before the per-doc mean
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = r6((4 * r6(math.log(5.0 / 13)) + 3 * r6(math.log(4.0 / 13))) / 7)
    assert(out(1L) == expected)
  }

  test("DSIR: target-like pool docs outweigh junk; deterministic; pool-only") {
    // target domain speaks "spark sql" vocabulary; the pool mixes
    // target-like docs with junk from a disjoint vocabulary
    val target = (1L to 10L).map(i =>
      (i, "spark sql query plan shuffle join aggregate", "tgt"))
    val likeTarget = (101L to 110L).map(i =>
      (i, "spark sql join shuffle plan", "pool"))
    val junk = (201L to 210L).map(i =>
      (i, "banana umbrella walrus kazoo pretzel", "pool"))
    val docs = (target ++ likeTarget ++ junk).toDF("doc_id", "text", "source")
    val out = Selection.dsir(docs, col("source") === "tgt", budget = 12)
      .collect()
    assert(out.length == 12)
    assert(out.forall(_.getAs[Long]("doc_id") > 100L), "target docs never selected")
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight")).toMap
    val likeW = (101L to 110L).flatMap(byId.get)
    val junkW = (201L to 210L).flatMap(byId.get)
    assert(likeW.size == 10, "every target-like doc beats every junk doc into a 12-slot budget")
    if (junkW.nonEmpty)
      assert(likeW.min > junkW.max, s"weights must separate: $likeW vs $junkW")
    // membership is a pure function of (content, seed)
    val again = Selection.dsir(docs, col("source") === "tgt", budget = 12).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("stored DSIR model: probe selection is byte-identical to the in-flight form") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("dsir_model").toString + "/m"
    Selection.buildDsirModel(docs, col("source") === "src0", dir)
    val inFlight = Selection.dsir(docs, col("source") === "src0", budget = 40)
      .collect().map(_.toString).toSeq
    val probed = Selection.dsirStored(docs.where(col("source") =!= "src0"),
        dir, budget = 40)
      .collect().map(_.toString).toSeq
    assert(probed == inFlight)
  }

  test("bigram log-prob punishes scrambled transitions the unigram model can't see") {
    // docs 1 and 2 have IDENTICAL unigram distributions; doc 2's
    // transitions are novel (scrambled), doc 1 repeats the corpus's
    // dominant transitions — only a bigram model separates them
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "mat the on sat cat the mat the on sat cat the"),
      (3L, "the cat sat on the mat"),
      (4L, "x")).toDF("doc_id", "text")
    val uni = TextAnalysis.unigramLogProb(docs)
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    val bi = TextAnalysis.bigramLogProb(docs)
      .select(col("doc_id"), col("n_bigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("lp"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(math.abs(uni(1L) - uni(2L)) < 1e-9,
      "unigram model must NOT separate the permuted doc")
    assert(bi(1L)._2 > bi(2L)._2 + 0.15,
      s"bigram model must punish scrambled transitions: ${bi(1L)._2} vs ${bi(2L)._2}")
    assert(bi(1L)._1 == 11 && bi(3L)._1 == 5)
    assert(bi(4L)._1 == 0, "single-token doc has no bigram positions")
  }

  // ------------------------------------------------------------ k-anonymity
  test("k-anonymity suppresses small quasi-identifier groups") {
    val rows = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
      (4L, "de", "b"), (5L, "de", "b"),
      (6L, "fr", "c"))
      .toDF("id", "lang", "src")
    val kept = Privacy.kAnonymize(rows, Seq("lang", "src"), k = 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L))
    val profile = Privacy.kAnonymityProfile(rows, Seq("lang", "src"), k = 2)
      .where(col("suppressed")).select("lang").as[String].collect().toSeq
    assert(profile == Seq("fr"))
  }
}
