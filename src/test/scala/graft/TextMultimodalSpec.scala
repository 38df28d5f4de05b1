package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Profiler, QualityModel, TextAnalysis}

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("token counts on known strings") {
    val docs = Seq(
      (1L, "hello world, it's 42 degrees!"),
      (2L, "   "),
      (3L, "one-two")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenCounts(docs)
      .select("doc_id", "ws_tokens", "bpe_tokens").orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // "hello world, it's 42 degrees!": ws=5; bpe = hello|world|,|it|'|s|4|2|degrees|! = 10
    assert(out(0) == ((1L, 5L, 10L)))
    assert(out(1) == ((2L, 0L, 0L))) // whitespace-only
    assert(out(2) == ((3L, 1L, 3L))) // one|-|two
  }

  test("normalizeText: NFC composes, CRLF/controls/whitespace canonicalised, idempotent") {
    val decomposed = "caf" + "e\u0301" // e + combining acute (5 codepoints)
    val composed = "caf\u00e9"         // precomposed e-acute (4 codepoints)
    val docs = Seq(
      (1L, decomposed),
      (2L, "a\r\nb\rc"),                           // CRLF + lone CR -> LF
      (3L, "x\u0001y\u0007z"),                  // control chars stripped
      (4L, "a \t  b"),                             // tab/space runs -> one space
      (5L, "p1 \n \n\n\n q2"),                     // spaces around LFs + 3+ LFs -> para
      (6L, "  already clean  "),                   // trim only
      (7L, "untouched")).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeText(docs)
      .select("doc_id", "norm_text", "changed")
      .orderBy("doc_id").as[(Long, String, Boolean)].collect()
    assert(out(0)._2 == composed && out(0)._3)
    assert(out(0)._2.length == 4)                  // é is ONE codepoint after NFC
    assert(out(1)._2 == "a\nb\nc")
    assert(out(2)._2 == "xyz")
    assert(out(3)._2 == "a b")
    assert(out(4)._2 == "p1\n\nq2")
    assert(out(5)._2 == "already clean")
    assert(out(6)._2 == "untouched" && !out(6)._3)
    // idempotence: normalizing the normalized corpus is the identity
    val renorm = TextAnalysis.normalizeText(
        out.toSeq.map(r => (r._1, r._2)).toDF("doc_id", "text"))
      .select("doc_id", "changed").as[(Long, Boolean)].collect()
    assert(renorm.forall(!_._2))
  }

  test("canonicalize scan is equivalent to the five-regex chain on adversarial strings") {
    // the contract's original implementation, kept here as the test oracle
    def regexChain(df: org.apache.spark.sql.DataFrame) = {
      val steps = Seq(
        "\\r\\n?" -> "\n",
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]" -> "",
        "[ \\t]+" -> " ",
        " *\\n *" -> "\n",
        "\\n{3,}" -> "\n\n")
      val replaced = steps.foldLeft(
          graft.expressions.StringExpressions.nfc(col("text"))) {
        case (c, (pat, rep)) => regexp_replace(c, pat, rep)
      }
      df.withColumn("expect", trim(replaced, " \n"))
    }
    val rng = new scala.util.Random(42)
    val alphabet: IndexedSeq[String] = IndexedSeq(
      "a", "B", "9", ".", "\u00e9", "e\u0301", "\u4f60",
      " ", "  ", "\t", "\n", "\n\n\n", "\r", "\r\n",
      "\u0001", "\u0007", "\u000b", "\u000c", "\u001f", "\u007f")
    val rows = (1L to 400L).map { i =>
      (i, (0 until rng.nextInt(30)).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString)
    }
    val df = rows.toDF("doc_id", "text")
    val both = regexChain(df).withColumn("got",
        graft.expressions.StringExpressions.canonicalize(col("text")))
      .select("doc_id", "text", "expect", "got")
      .as[(Long, String, String, String)].collect()
    both.foreach { case (id, raw, expect, got) =>
      assert(got == expect,
        s"doc $id: scan != regex chain for ${raw.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("bm25: tf saturation ranks, only matching docs, partitioning-invariant") {
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "banana cherry banana"),
      (3L, "cherry cherry"),
      (4L, "durian unique")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, Seq(0L -> "banana", 1L -> "durian cherry"))
      .orderBy("query_id", "rk")
      .select("query_id", "doc_id", "rk", "score")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // q0 "banana": only docs 1, 2 match; d2 (tf=2) outranks d1 (tf=1)
    val q0 = out.filter(_._1 == 0L)
    assert(q0.map(r => (r._2, r._3)) == Seq((2L, 1L), (1L, 2L)))
    // q1 "durian cherry": docs 2, 3, 4 match (never doc 1); d4's term is
    // rarer (df=1 vs cherry's df=2) so idf puts d4 first despite d3's tf=2
    val q1 = out.filter(_._1 == 1L)
    assert(q1.map(_._2).toSet == Set(2L, 3L, 4L))
    assert(q1.head._2 == 4L)
    // scores positive, ranks contiguous from 1
    assert(out.forall(_._4 > 0))
    assert(q1.map(_._3) == Seq(1L, 2L, 3L))
    // deterministic under repartitioning
    val again = TextAnalysis.bm25(docs.repartition(7), Seq(0L -> "banana", 1L -> "durian cherry"))
      .orderBy("query_id", "rk")
      .select("query_id", "doc_id", "rk", "score")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(again == out)
  }

  test("stored bigram LM: probe == in-flight on the pool, finite on unseen text") {
    val pool = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "a cat and a dog")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bglm").toString
    TextAnalysis.buildBigramLm(pool, dir)
    val fresh = TextAnalysis.bigramLogProb(pool)
      .select("doc_id", "n_bigrams", "avg_logprob").orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    val stored = TextAnalysis.bigramLogProbStored(pool, dir)
      .select("doc_id", "n_bigrams", "avg_logprob").orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(stored == fresh)
    // unseen text: unseen history/continuation words must yield finite
    // scores (half-count floor), and rarer transitions score lower
    val unseen = Seq(
      (10L, "the cat sat on the mat"),      // all seen
      (11L, "zebra quagga okapi zebra"))    // nothing seen
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProbStored(unseen, dir)
      .orderBy("doc_id").select("doc_id", "n_bigrams", "avg_logprob")
      .as[(Long, Long, Double)].collect()
    assert(out.forall(r => !r._3.isNaN && !r._3.isInfinite))
    assert(out(0)._3 > out(1)._3, "fully-unseen text must score lower")
  }

  test("blocklist screen: exact counts, distinct hits, audit keeps all docs") {
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "bad BAD worse"),
      (3L, "bad-adjacent badger")).toDF("doc_id", "text") // badger != bad
    val out = TextAnalysis.blocklistScreen(docs, Seq("bad", "worse"))
      .select("doc_id", "n_blocked", "n_distinct_blocked", "blocked")
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, false),
      (2L, 3L, 2L, true),   // bad, BAD (case-folded), worse
      (3L, 1L, 1L, true)))  // "bad-adjacent" tokenizes to bad + adjacent
  }

  test("blocklist screen: phrase + hyphenated entries match token sequences") {
    val docs = Seq(
      (1L, "send an e-mail today"),          // hyphenated entry hits
      (2L, "the word email alone"),          // 'email' is ONE token, not (e, mail)
      (3L, "bad phrase and a bad phrase"),   // phrase twice + 'bad' twice
      (4L, "phrase bad"),                    // reversed order: no phrase hit
      (5L, "a a a")).toDF("doc_id", "text")  // overlap: 'a a' at pos 1 and 2
    val out = TextAnalysis.blocklistScreen(docs,
        Seq("e-mail", "bad phrase", "bad", "a a"))
      .select("doc_id", "n_blocked", "n_distinct_blocked", "blocked")
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, true),   // (e, mail) bigram
      (2L, 0L, 0L, false),  // single token 'email' is not the bigram
      (3L, 4L, 2L, true),   // 2x 'bad phrase' + 2x 'bad' (positions overlap-aware)
      (4L, 1L, 1L, true),   // only the single-token 'bad'
      (5L, 2L, 1L, true)))  // overlapping 'a a' counted at both positions
    // an entry with no alphanumeric token can never match -> loud error
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.blocklistScreen(docs, Seq("bad", "!!!"))
    }
    assert(e.getMessage.contains("alphanumeric"))
    // normalization dedup: 'e-mail' and 'e mail' are the same entry
    val dedup = TextAnalysis.blocklistScreen(docs, Seq("e-mail", "e mail"))
      .where($"doc_id" === 1L)
      .select("n_blocked", "n_distinct_blocked")
      .as[(Long, Long)].collect().head
    assert(dedup == ((1L, 1L)))
  }

  test("corpusDatasheet: group rows, rollup subtotals, dup + pii counts") {
    val docs = Seq(
      (1L, "en", "web", "the cat sat"),
      (2L, "en", "web", "the cat sat"),            // exact dup of doc 1
      (3L, "en", "book", "reach me at a@b.io ok"), // pii: email
      (4L, "de", "web", "der hund 10.0.0.1 lief")  // pii: ipv4
    ).toDF("doc_id", "lang", "source", "text")
    val out = Profiler.corpusDatasheet(docs)
      .select("lang", "source", "n_docs", "n_tokens", "dup_docs", "pii_docs")
      .as[(Option[String], Option[String], Long, Long, Long, Long)]
      .collect().toSeq
    // rollup: grand total first (nulls first), then per-lang subtotals,
    // then leaf groups
    assert(out.head == ((None, None, 4L, 15L, 1L, 2L)))
    assert(out.contains((Some("en"), None, 3L, 11L, 1L, 1L)))
    assert(out.contains((Some("en"), Some("web"), 2L, 6L, 1L, 0L)))
    assert(out.contains((Some("de"), Some("web"), 1L, 4L, 0L, 1L)))
  }

  test("quality score is bounded and penalises junk") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is happy for a while"),
      (2L, "@@@@ #### $$$$ %%%%")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality_score").orderBy("doc_id")
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))
    out.values.foreach(s => assert(s >= 0.0 && s <= 1.0))
  }

  test("language id picks the stopword-dominant language, CJK wins outright") {
    val docs = Seq(
      (1L, "the cat and the dog is in the house"),
      (2L, "der hund und die katze ist nicht mit der maus"),
      (3L, "le chat est dans la maison pour le chien"),
      (4L, "你好世界 some latin too"),
      (5L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(docs)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "zh", 5L -> "unknown"))
  }

  test("fused lang profile is count-identical to the five-regex form on adversarial strings") {
    // Every \b / tokenization corner the four alternations have:
    // stopwords embedded in longer words (no \b), underscore and digit
    // joins (Java \w kills the boundary), punctuation/apostrophe
    // boundaries (boundary present), case folding, CJK mixed with
    // latin, CJK range edges (U+4E00/U+9FFF in, U+4DFF/U+A000 out),
    // shared stopwords across languages (que/est/la), empty and
    // whitespace-only docs.
    val cases = Seq(
      "the quick and the dead",            // plain hits
      "loathe theory anthem",              // 'the' embedded: zero hits
      "the_cat the5 _the the",             // \w joins kill all but the last
      "c'est l'est que-des (la)",          // punctuation creates boundaries
      "THE AND OF To iS",                  // case folds to hits
      "你好 the 世界 und",                  // CJK + latin mixed
      "䷿一鿿ꀀ",          // CJK range edges: exactly 2 in
      "que est la",                        // fr/es shared tokens
      "der die das la le el",              // multi-language tie fodder
      "   ",                               // whitespace only
      "",                                  // empty
      "a1the2b und3 4und 5und6")           // digit joins: zero hits
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val docs = cases.toDF("doc_id", "text")
    val cols = Seq("doc_id", "cnt_en", "cnt_de", "cnt_fr", "cnt_es", "cnt_cjk", "lang_pred")
    val fused = TextAnalysis.languageId(docs)
      .select(cols.head, cols.tail: _*).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    val regex = TextAnalysis.languageIdRegex(docs)
      .select(cols.head, cols.tail: _*).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(fused == regex)
  }

  test("fused quality profile is value-identical to the regex form on adversarial strings") {
    // Every per-count corner: astral chars (length counts CODE POINTS,
    // not UTF-16 units), non-space leading/trailing whitespace (Spark
    // trim strips 0x20 only, split keeps boundary empties at limit -1),
    // all-whitespace and all-space docs, vertical tab/form feed (\s
    // members), stopword 'a' as a single-char token, stopwords embedded
    // in words, digit/underscore joins, mixed unicode letters (non-word
    // under Java \w).
    val cases = Seq(
      "the cat and a dog",                 // plain hits incl. 1-char 'a'
      "😀 emoji 𝄞 astral",                 // 4 astral units, 2 codepoints
      "\ta b\t",                            // tab edges survive trim
      "  a b  ",                            // space edges do not
      "a\u000Bb\fc",                        // VT + FF are \s
      "loathe that5 _a a_ a",               // embedded/joined stopwords
      "élan für naïve",                     // unicode letters: non-alpha, non-word
      "1234 56a78 _9",                      // digits vs alnum tokens
      "for for for")                        // repeat counting
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val docs = cases.toDF("doc_id", "text")
    val cols = Seq("doc_id", "n_chars_calc", "n_tokens", "alpha_ratio",
      "punct_ratio", "stopword_ratio", "quality_score")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(cols.head, cols.tail: _*).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(rows(TextAnalysis.qualityScore(docs)) ===
      rows(TextAnalysis.qualityScoreRegex(docs)))
    // Degenerate docs (empty / zero-token): BOTH forms hit ANSI
    // divide-by-zero in the ratio columns (pre-existing contract — real
    // corpora filter empties before scoring; even a pruned select trips
    // it via ConvertToLocalRelation's eager projection), so equivalence
    // on these is asserted over the raw divide-free counts directly:
    // " \t " trims (spaces only) to "\t" -> 0 runs + 2 boundary
    // empties = 2 "tokens", exactly like size(split(trim(x), "\\s+")).
    val degenerate = Seq((0L, ""), (1L, "    "), (2L, " \t "), (3L, "\t\t"))
      .toDF("doc_id", "text")
    val prof = graft.expressions.StringExpressions.qualityProfile(col("text"))
    val fusedCounts = degenerate.select(col("doc_id"),
        prof.getField("n_chars"), prof.getField("n_tokens"),
        prof.getField("n_alpha"), prof.getField("n_ws"), prof.getField("n_stops"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val n = length(col("text")).cast("long")
    val regexCounts = degenerate.select(col("doc_id"), n,
        graft.functions.wsTokenCount(col("text")),
        n - length(regexp_replace(col("text"), "[A-Za-z]", "")).cast("long"),
        n - length(regexp_replace(col("text"), "\\s", "")).cast("long"),
        size(regexp_extract_all(lower(col("text")), lit(TextAnalysis.enStopwords))).cast("long"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(fusedCounts === regexCounts)
  }

  test("fingerprints: identical text = identical md5 + shingle sig") {
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "totally different words here now ok"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fingerprints(docs)
      .select("doc_id", "content_md5", "shingle_sig", "n_shingles")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(out(0)._2 == out(1)._2 && out(0)._3 == out(1)._3)
    assert(out(0)._2 != out(2)._2)
    assert(out(0)._4 == 4L) // 8 tokens -> 4 distinct 5-gram shingles
  }

  test("winnowing fingerprints overlap heavily for local edits, not for different docs") {
    val a = "the quick brown fox jumps over the lazy dog while the band plays on and on"
    val b = a.replace("lazy", "hazy") // one local edit
    val c = "completely unrelated content talking about database engines and query plans"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowingFingerprints(docs)
      .as[(Long, Array[Long])].collect().toMap
    def overlap(x: Array[Long], y: Array[Long]): Double =
      x.toSet.intersect(y.toSet).size.toDouble / x.toSet.union(y.toSet).size
    assert(overlap(fp(1L), fp(2L)) > 0.5, "local edit should preserve most fingerprints")
    assert(overlap(fp(1L), fp(3L)) < 0.1, "unrelated docs should not collide")
    // deterministic across runs
    val fp2 = TextAnalysis.winnowingFingerprints(docs)
      .as[(Long, Array[Long])].collect().toMap
    assert(fp(1L).toSeq == fp2(1L).toSeq)
  }

  test("multimodal: media schema, deterministic features, frame sampling") {
    val docs = Seq((6L, "hello world this is binary payload")).toDF("doc_id", "text")
    val media = Multimodal.withMedia(docs)
    assert(media.schema("content").dataType.typeName == "binary")
    val meta = media.select("meta.format", "meta.n_bytes", "meta.width", "meta.height")
      .as[(String, Long, Long, Long)].head()
    assert(meta == (("jpeg", 34L, 64L + 6 % 8 * 32, 64L + 48L))) // doc_id=6: 6%3=0, 6%5=1
    val f1 = Multimodal.extractFeatures(media).collect().head.features.toSeq
    val f2 = Multimodal.extractFeatures(media).collect().head.features.toSeq
    assert(f1 == f2 && f1.length == 32)
    assert(math.abs(f1.sum - 1.0f) < 1e-5, "features normalised by byte count")
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 2).collect()
    // 34 bytes -> frames 0..4; stride 2 keeps 0,2,4
    assert(frames.map(_.frame_idx).toSeq.sorted == Seq(0, 2, 4))
    assert(frames.find(_.frame_idx == 4).get.frame.length == 2) // 34 - 32 tail
  }

  test("pii redaction replaces emails/ips/phones and counts per type") {
    val docs = Seq(
      (1L, "mail me at bob.smith+x@corp.example.com or 10.0.0.1"),
      (2L, "call +1 (555) 123-4567 now"),
      (3L, "clean text, no pii 42")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs)
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted_text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, 0L, "mail me at <EMAIL> or <IP>"),
      (2L, 0L, 0L, 1L, "call <PHONE> now"),
      (3L, 0L, 0L, 0L, "clean text, no pii 42")))
  }

  test("fused pii scan is byte-identical to the 6-regex chain on adversarial strings") {
    // Every backtracking / boundary / nesting corner the three patterns
    // have: IPs living inside emails (counted, not re-replaced), emails
    // whose domain backtracks off a digit run, \b edges created by a
    // prior replacement, 5-octet runs, phone-length backtracking off
    // parens/dashes, and non-BMP text around matches.
    val cases = Seq(
      "a@1.2.3.4.co mail",            // ip inside the email's domain
      "x@y.co1.2.3.4",                // no \b before 1 in raw text; one appears after <EMAIL>
      "1.2.3.4.5 and 1.2.3.4",        // 5-octet run: first four octets match
      "x1.2.3.4 no boundary",         // leading word char kills the \b
      "+1 (555) 123-4567 or 555 1234 5678 90", // max-length backtracking
      "12345678901234567890",          // 20-digit run: non-overlapping phone splits
      "a@b.co c@d.io 10.0.0.1 +44 20 7946 0958", // all three kinds mixed
      "()+-- not a phone 12",          // near-miss punctuation
      "émail@exämple.com 😀 1.2.3.4",  // non-ascii local/domain chars break the match
      "a.b-c_d%e+f@sub.do-main.org trailing", // full local-part class
      "@@@ 999.999.999.999 ",    // octet values are NOT range-checked (1-3 digits)
      "",                              // empty doc
      "+123456789012345678",           // phone pattern upper-bound overrun
      "a@b.cd1.2.3.4e@f.gh",           // replacement butts two match sites together
      // prescan boundary cases (the byte-level necessary-condition
      // skip added in r20 must never produce a false skip):
      "123456789",                     // minimal phone: digit gap exactly 8
      "12345678",                      // one short of a phone: gap 7, no match
      "1        2",                    // gap-8 run of spaces IS a phone
      "1                    2",        // gap > 15: prescan fires, regex rejects
      "1(23) 4-5 67",                  // parens/dash/space class run
      "123é45678 9",              // multibyte char breaks the class run
      "a.1 b.2 c.3",                   // dot BEFORE digit only: ip impossible
      "1. 2. 3. 4.",                   // digit-dot present, no full ip
      "1@b.co.2.3.4.5",                // email replacement seam next to an ip
      "+123456789",                    // phone needing the optional plus
      "no pii at all here")            // fully clean: prescan skips everything
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val docs = cases.toDF("doc_id", "text")
    val cols = Seq("doc_id", "n_emails", "n_ips", "n_phones", "redacted_text")
    val fused = TextAnalysis.redactPii(docs)
      .select(cols.head, cols.tail: _*).orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val chain = TextAnalysis.redactPiiRegex(docs)
      .select(cols.head, cols.tail: _*).orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(fused == chain)
    // and a null-text doc propagates a null struct -> null fields
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(99L, null: String))),
      docs.schema)
    val nf = TextAnalysis.redactPii(withNull).select("n_emails", "redacted_text")
      .collect().head
    assert(nf.isNullAt(0) && nf.isNullAt(1))
  }

  test("multimodal resize: aspect-preserving fit, proportional bytes, small passthrough") {
    // doc_id=7: 7%3=1 -> png, width 64+7%8*32=288, height 64+7%5*48=160
    val docs = Seq((7L, "x" * 900)).toDF("doc_id", "text")
    val media = Multimodal.withMedia(docs)
    val r = Multimodal.resize(media, maxSide = 128).collect().head
    assert(r.meta.width == 128 && r.meta.height == 71) // 160 * 128/288 = 71.1
    assert(r.meta.format == "png")
    // byte budget tracks the area reduction: 900 * (128*71)/(288*160) ~ 177
    assert(math.abs(r.content.length - 900.0 * 128 * 71 / (288 * 160)) <= 1)
    assert(r.meta.nBytes == r.content.length)
    // under the cap: untouched rows, identical payload
    val small = Multimodal.resize(media, maxSide = 512).collect().head
    assert(small.meta.width == 288 && small.meta.height == 160)
    assert(small.content.length == 900)
  }

  /** Encode a real PNG with a deterministic pixel pattern. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y * 13) % 256) * 0x010101)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("real imageio decode: dims from pixels, histogram normalised, corrupt quarantined") {
    val media = Seq(
      (1L, pngBytes(40, 24)),
      (2L, "definitely not an image".getBytes("UTF-8"))).toDF("doc_id", "content")
    val out = Multimodal.decodeImages(media, dim = 16).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(1L).ok && out(1L).width == 40 && out(1L).height == 24)
    assert(math.abs(out(1L).features.map(_.toDouble).sum - 1.0) < 1e-5)
    // corrupt payload is data, not a task failure
    assert(!out(2L).ok && out(2L).width == 0 && out(2L).features.forall(_ == 0f))
  }

  test("real imageio resize: fitDims geometry, decodable output, passthroughs") {
    val media = Seq(
      (1L, pngBytes(288, 160)), // shrinks: fit 128 -> 128 x 71
      (2L, pngBytes(20, 10)),   // already small: byte-identical
      (3L, "junk".getBytes("UTF-8"))).toDF("doc_id", "content")
    val out = Multimodal.resizeImages(media, maxSide = 128).collect()
      .map(r => r.doc_id -> r).toMap
    // geometry matches the shared fitDims math (same as the stub path)
    assert(Multimodal.fitDims(288, 160, 128) == ((128L, 71L)))
    assert(out(1L).meta.width == 128 && out(1L).meta.height == 71)
    // the emitted payload is a REAL png: decoding it returns the new dims
    val re = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).content))
    assert(re.getWidth == 128 && re.getHeight == 71)
    assert(out(2L).meta.width == 20 && out(2L).content.sameElements(pngBytes(20, 10)))
    assert(out(3L).meta.format == "raw" && out(3L).content.sameElements("junk".getBytes("UTF-8")))
  }

  test("learned quality model: held-out AUC vs heuristic labels, bounded scores") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val scored = QualityModel.heldOutScores(docs)
      .as[(Long, Double)].collect()
    assert(scored.nonEmpty)
    assert(scored.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
    // rank-sum AUC of the model's held-out scores against the heuristic
    // labels it was trained to mimic — generalisation, not memorisation
    // (the scored docs never entered training)
    val truth = graft.operators.TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), (col("quality_score") >= 0.75).as("pos"))
      .as[(Long, Boolean)].collect().toMap
    val (pos, neg) = scored.partition { case (id, _) => truth(id) }
    assert(pos.nonEmpty && neg.nonEmpty, "held-out split needs both classes")
    val concordant = (for { (_, ps) <- pos; (_, ns) <- neg } yield
      if (ps > ns) 1.0 else if (ps == ns) 0.5 else 0.0).sum
    val auc = concordant / (pos.size.toLong * neg.size)
    assert(auc >= 0.8, s"held-out AUC $auc (${pos.size} pos / ${neg.size} neg)")
  }

  test("stored quality model: probe-phase scores agree with the fresh-trained path") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_qstored").toString
    QualityModel.save(QualityModel.trainHeldOut(docs), dir)
    val stored = QualityModel.score(
        QualityModel.load(dir), docs.where(QualityModel.heldOutPred()))
      .as[(Long, Double)].collect().sortBy(_._1)
    val fresh = QualityModel.heldOutScores(docs)
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(stored.nonEmpty && stored.map(_._1).sameElements(fresh.map(_._1)))
    // identical ids; scores within float-combine tolerance (L-BFGS
    // aggregation order may differ between fits)
    assert(stored.zip(fresh).forall { case ((_, a), (_, b)) => math.abs(a - b) <= 1e-6 },
      "stored-model scores diverge from fresh-trained scores")
    // no held-out row ever entered training (the predicate partitions)
    assert(docs.where(QualityModel.heldOutPred())
      .join(docs.where(!QualityModel.heldOutPred()), Seq("doc_id"), "inner").count() == 0)
  }

  test("quality model save/load round-trip scores identically") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val labeled = graft.operators.TextAnalysis.qualityScore(docs)
    val model = QualityModel.train(labeled, col("quality_score") >= 0.75)
    val dir = java.nio.file.Files.createTempDirectory("graft_qmodel").toString
    QualityModel.save(model, dir)
    val direct = QualityModel.score(model, docs)
      .as[(Long, Double)].collect().sorted.toSeq
    val reloaded = QualityModel.score(QualityModel.load(dir), docs)
      .as[(Long, Double)].collect().sorted.toSeq
    assert(direct == reloaded && direct.nonEmpty)
  }
}
