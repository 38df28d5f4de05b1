package graft

import org.apache.spark.sql.functions._
import graft.expressions.{TokenExpressions, TokenScan}

/** Equivalence pins for the byte-scan tokenizers that replaced the
  * regex/higher-order forms in the corpus hot path (r19): each scan
  * must reproduce its legacy expression EXACTLY — the legacy forms stay
  * here as the executable contract, and the DuckDB oracles of every
  * consumer certify the swap end-to-end. */
class TokenScanSpec extends SparkSpec {
  import spark.implicits._

  private val bpeish = operators.TextAnalysis.bpeishPattern

  // Adversarial cases: ASCII word soup, boundary whitespace of every
  // Java-\s class, digit runs, punctuation runs, the two code points
  // that LOWERCASE INTO [a-z0-9] (Kelvin sign -> k, dotted capital I ->
  // i + combining dot), non-ASCII whitespace (NBSP is NOT Java \s),
  // CJK, combining marks, supplementary (surrogate-pair) code points,
  // and empty/whitespace-only strings.
  private val cases: Seq[String] = Seq(
    "", " ", "   ", "\t", "\n\n", " \t leading and trailing \r\n ",
    "plain words here", "MiXeD CaSe WORDS", "digits 123 and 4a5b6",
    "a", "Z", "7", "...", "a.b,c;d", "one--two__three",
    "tab\tsep\nnewlinevtab\ffeed\rcr",
    "Kelvin K2 xKy", "İstanbul İ IİI",
    "café naïve résumé", "nbsp sep",
    "中文处理 mixed 中 text",
    "combíning märks", "emoji 😀 pair 🎉x",
    "fullａwidth Ａletters", " Alignße straße",
    "K", "İ", "😀", "0", "00 11 22",
    "ends with space ", " starts with space", "a  b   c",
    "punct!@#$%^&*()runs", "mixed123abc456def",
    "a\u00A0b nbsp", "x\u212Ay kelvin-joins", "w\u0130z dotted-I",
    "line\u2028sep", "a\u0307combining", "\u00A0", "\u212A\u212A")

  // Deterministic fuzz over an alphabet that stresses every branch.
  private val fuzz: Seq[String] = {
    val alphabet = ("abcXYZ019 .,\t\n" + "Kİé中 " +
      "😀").toCharArray
    val rnd = new scala.util.Random(20260818L)
    (1 to 200).map { _ =>
      val len = rnd.nextInt(40)
      new String(Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))))
    }
  }

  private val all = (cases ++ fuzz) :+ (null: String)

  test("WordTokensExpr === filter(split(lower(text)), nonEmpty) on adversarial + fuzz") {
    val df = all.toDF("text")
    val rows = df.select(
      TokenExpressions.wordTokens(col("text")).as("fast"),
      filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "").as("legacy"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch on ${r.get(2)}")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"token mismatch on ${r.get(2)}: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("BpeishTokensExpr === regexp_extract_all(text, bpeishPattern) on adversarial + fuzz") {
    val df = all.toDF("text")
    val rows = df.select(
      TokenExpressions.bpeishTokens(col("text")).as("fast"),
      regexp_extract_all(col("text"), lit(bpeish), lit(0)).as("legacy"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch on ${r.get(2)}")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"pre-token mismatch on ${r.get(2)}: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("TokenCountsExpr === (wsTokenCount, size(regexp_extract_all), length, size(wordTokens))") {
    val df = all.toDF("text")
    val rows = df.select(
      TokenExpressions.tokenCounts(col("text")).as("fast"),
      graft.functions.wsTokenCount(col("text")).as("ws"),
      size(regexp_extract_all(col("text"), lit(bpeish), lit(0))).cast("long").as("bpe"),
      length(col("text")).cast("long").as("chars"),
      size(filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= ""))
        .cast("long").as("words"),
      col("text")).collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(5), s"null mismatch on ${r.get(5)}")
      else {
        val s = r.getStruct(0)
        assert(s.getLong(0) == r.getLong(1), s"ws mismatch on '${r.get(5)}': ${s.getLong(0)} vs ${r.getLong(1)}")
        assert(s.getLong(1) == r.getLong(2), s"bpe mismatch on '${r.get(5)}': ${s.getLong(1)} vs ${r.getLong(2)}")
        assert(s.getLong(2) == r.getLong(3), s"chars mismatch on '${r.get(5)}'")
        assert(s.getLong(3) == r.getLong(4), s"words mismatch on '${r.get(5)}': ${s.getLong(3)} vs ${r.getLong(4)}")
      }
    }
  }

  test("BigramsExpr === transform(sequence, element_at) adjacent pairs") {
    val legacyPairs = (w: org.apache.spark.sql.Column) =>
      transform(sequence(lit(0), size(w) - 2),
        i => struct(element_at(w, i + 1).as("a"), element_at(w, i + 2).as("b")))
    val df = all.toDF("text")
      .select(TokenExpressions.wordTokens(col("text")).as("w"))
      .where(size(col("w")) >= 2)
    val rows = df.select(
      TokenExpressions.bigrams(col("w")).as("fast"),
      legacyPairs(col("w")).as("legacy")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](0) == r.getSeq[org.apache.spark.sql.Row](1))
    }
  }

  test("WordBucketsExpr === transform(wordTokens, md5/conv bucket) for several bucket counts") {
    for (buckets <- Seq(7, 256, 4096)) {
      val df = all.toDF("text")
      val rows = df.select(
        TokenExpressions.wordBuckets(col("text"), buckets).as("fast"),
        transform(TokenExpressions.wordTokens(col("text")),
          t => conv(substring(md5(t), 1, 6), 16, 10).cast("long") % buckets)
          .as("legacy"),
        col("text")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch on ${r.get(2)}")
        if (!r.isNullAt(0))
          assert(r.getSeq[Long](0) == r.getSeq[Long](1),
            s"bucket mismatch (buckets=$buckets) on '${r.get(2)}'")
      }
    }
  }

  test("TokenScan.lowerAlnum === toLowerCase(ROOT).split.filter on adversarial + fuzz") {
    all.foreach { s =>
      val legacy = (if (s == null) "" else s)
        .toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      assert(TokenScan.lowerAlnum(s).toSeq == legacy,
        s"lowerAlnum mismatch on '$s': ${TokenScan.lowerAlnum(s).toSeq} vs $legacy")
    }
  }

  test("TokenScan.bpeishEach === java.util.regex matcher iteration") {
    val re = java.util.regex.Pattern.compile(bpeish)
    all.foreach { s =>
      val legacy = scala.collection.mutable.ArrayBuffer.empty[String]
      val m = re.matcher(if (s == null) "" else s)
      while (m.find()) legacy += m.group()
      val fast = scala.collection.mutable.ArrayBuffer.empty[String]
      TokenScan.bpeishEach(s)(fast += _)
      assert(fast == legacy, s"bpeishEach mismatch on '$s': $fast vs $legacy")
    }
  }
}
