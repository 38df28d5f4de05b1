package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize expressions for the corpus hot path.
  *
  * Every text operator tokenizes, and until this round the two corpus
  * tokenizers ran as composed generic expressions:
  *
  *  - word tokens: `filter(split(lower(text), "[^a-z0-9]+"), _ != "")` —
  *    `filter` is a higher-order function, which is CodegenFallback, so
  *    the surrounding stage LOSES whole-stage codegen; `lower` allocates
  *    a lowered copy of the document, `split` runs the regex engine and
  *    materialises an array that includes the boundary empties, and the
  *    filter pass allocates the final array again.
  *  - GPT-2-ish pre-tokens: `regexp_extract_all(text, bpeishPattern)` —
  *    regex alternation over every char with a `Matcher` allocation per
  *    row and a `String`→`UTF8String` copy per match.
  *
  * Both grammars are regular and character-class-driven, so each runs
  * here as ONE byte-level scan over the UTF-8 payload with no regex
  * engine, no lowered copy, and no boundary-empty churn — and, being
  * plain (non-higher-order) expressions, whole-stage codegen survives.
  *
  * Equivalence contracts (spec-pinned on adversarial cases, certified
  * end-to-end by the unchanged DuckDB oracles of every consumer):
  *
  *  - [[WordTokensExpr]] === `filter(split(lower(text), "[^a-z0-9]+"),
  *    _ != "")`. Lowercasing maps into `[a-z0-9]` ONLY from `A-Z`,
  *    U+212A (KELVIN SIGN → k) and U+0130 (İ → i + combining dot above,
  *    whose combining dot then splits the run exactly where this scan
  *    closes the token); every other code point lowercases outside the
  *    class and acts as a separator either way.
  *  - [[BpeishTokensExpr]] === `regexp_extract_all(text,
  *    "[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]", 0)`. Java `\s` is ASCII-only,
  *    so non-ASCII whitespace is a (single-code-point) token, exactly
  *    like the regex; alternation order never matters because the three
  *    branches match disjoint character classes.
  *  - [[TokenCountsExpr]] === struct of `wsTokenCount(text)` (Spark
  *    `trim` strips 0x20 only; `split("\\s+", -1)` keeps one boundary
  *    empty per whitespace edge — replicated from [[QualityScan]]),
  *    `size(regexp_extract_all(text, bpeishPattern))` and
  *    `length(text)` (code points), all in one sweep with ZERO arrays.
  */
case class WordTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_tokens"

  override def nullSafeEval(input: Any): Any =
    TokenScan.wordTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenScan.wordTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WordTokensExpr =
    copy(child = newChild)
}

/** GPT-2-ish pre-tokenizer (letter runs, single digits, single
  * non-alnum-non-ws code points) as one byte scan — see file doc. */
case class BpeishTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpeish_tokens"

  override def nullSafeEval(input: Any): Any =
    TokenScan.bpeishTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenScan.bpeishTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeishTokensExpr =
    copy(child = newChild)
}

/** (ws_tokens, bpe_tokens, n_chars) in one sweep with no arrays — the
  * `text_tokens` profile. See file doc for the exact replicas. */
case class TokenCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = TokenScan.countsSchema

  override def prettyName: String = "token_counts"

  override def nullSafeEval(input: Any): Any =
    TokenScan.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenScan.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountsExpr =
    copy(child = newChild)
}

/** Adjacent-pair stream of a token array as ONE pass — replaces
  * `transform(sequence(0, size-2), i => struct(element_at(w, i+1),
  * element_at(w, i+2)))`, a doubly-higher-order CodegenFallback chain
  * that boxed an index sequence and interpreted two `element_at` calls
  * per bigram. Output elements alias the input's UTF8Strings (no
  * copies). Arrays shorter than 2 yield an empty array (the legacy
  * callers filtered those rows; `explode` drops them either way). */
case class BigramsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true))),
    containsNull = false)

  override def prettyName: String = "token_bigrams"

  override def nullSafeEval(input: Any): Any =
    TokenScan.bigrams(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenScan.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramsExpr =
    copy(child = newChild)
}

/** Per-doc array of hashed token buckets in one codegen'd pass:
  * `transform(wordTokens(text), t => conv(substring(md5(t), 1, 6), 16,
  * 10) % buckets)` — the engine-stable DSIR bucket trick whose md5/conv
  * arithmetic is part of the ORACLE contract and must not change — ran
  * as an interpreted higher-order transform building a hex string and
  * parsing it back per token. This computes the identical value from
  * the digest's first 3 bytes directly (first 6 hex chars == first 3
  * bytes, `conv(_, 16, 10)` == the uint24 they encode). */
case class WordBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, "buckets must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "word_buckets"

  override def nullSafeEval(input: Any): Any =
    TokenScan.wordBuckets(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenScan.wordBuckets($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): WordBucketsExpr =
    copy(child = newChild)
}

/** Static byte-scan kernels the generated code calls, plus the
  * `String`-based twins the typed (mapPartitions) operators use so the
  * Column path and the tight-loop path can never drift apart. */
object TokenScan {

  val countsSchema: StructType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("word_tokens", LongType, nullable = false)))

  // Java regex \s — ASCII only: [ \t\n\x0B\f\r]
  @inline private def isWsByte(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** UTF-8 sequence length from the lead byte (1 for continuation /
    * invalid lead bytes — the permissive skip UTF8String itself uses). */
  @inline private def seqLen(b: Int): Int =
    if (b < 0x80) 1
    else if (b >= 0xF0) 4
    else if (b >= 0xE0) 3
    else if (b >= 0xC0) 2
    else 1

  /** Is bytes(i) the start of U+0130 (İ = 0xC4 0xB0)? */
  @inline private def isU0130(bytes: Array[Byte], i: Int, end: Int): Boolean =
    bytes(i) == 0xC4.toByte && i + 1 < end && bytes(i + 1) == 0xB0.toByte

  /** Is bytes(i) the start of U+212A (KELVIN SIGN = 0xE2 0x84 0xAA)? */
  @inline private def isU212A(bytes: Array[Byte], i: Int, end: Int): Boolean =
    bytes(i) == 0xE2.toByte && i + 2 < end &&
      bytes(i + 1) == 0x84.toByte && bytes(i + 2) == 0xAA.toByte

  def wordTokens(u: UTF8String): GenericArrayData = {
    val bytes = u.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](8)
    var buf = new Array[Byte](64)
    var len = 0
    @inline def append(b: Byte): Unit = {
      if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
      buf(len) = b; len += 1
    }
    def close(): Unit = {
      if (len > 0) {
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len)))
        len = 0
      }
    }
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) {
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) append(b.toByte)
        else if (b >= 'A' && b <= 'Z') append((b + 32).toByte)
        else close()
        i += 1
      } else if (isU0130(bytes, i, n)) {
        // İ lowercases to i + COMBINING DOT ABOVE: contribute the i,
        // then the combining mark splits the run
        append('i'.toByte); close(); i += 2
      } else if (isU212A(bytes, i, n)) {
        append('k'.toByte); i += 3 // KELVIN SIGN lowercases to k
      } else {
        close(); i += seqLen(b)
      }
    }
    close()
    new GenericArrayData(out.toArray)
  }

  def bpeishTokens(u: UTF8String): GenericArrayData = {
    val bytes = u.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](8)
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        val start = i
        i += 1
        while (i < n && {
          val c = bytes(i) & 0xFF
          (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        }) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      } else if (b < 0x80) {
        if (!isWsByte(b)) out.add(UTF8String.fromBytes(bytes, i, 1))
        i += 1
      } else {
        val l = math.min(seqLen(b), n - i)
        out.add(UTF8String.fromBytes(bytes, i, l))
        i += l
      }
    }
    new GenericArrayData(out.toArray)
  }

  def counts(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = u.getBytes
    val n = bytes.length
    // --- ws_tokens: split("\s+", -1) semantics on the 0x20-trimmed text
    var lo = 0; var hi = n
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    var ws = 0L
    if (hi > lo) {
      var runs = 0L; var inRun = false
      var j = lo
      while (j < hi) {
        val b = bytes(j) & 0xFF
        // non-ASCII bytes are never Java-\s, so they extend a run
        val w = b < 0x80 && isWsByte(b)
        if (!w && !inRun) { runs += 1; inRun = true }
        else if (w) inRun = false
        j += 1
      }
      ws = runs
      if (isWsByte(bytes(lo) & 0xFF)) ws += 1     // leading boundary empty
      if (isWsByte(bytes(hi - 1) & 0xFF)) ws += 1 // trailing boundary empty
    }
    // --- bpe_tokens + n_chars + word_tokens in one pass. word_tokens
    // counts [[wordTokens]] runs: lowercased-alnum runs with the Kelvin
    // sign continuing a run and İ contributing an i then closing it.
    var bpe = 0L; var chars = 0L; var words = 0L
    var inWord = false
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        bpe += 1
        if (!inWord) { words += 1; inWord = true }
        while (i < n && {
          val c = bytes(i) & 0xFF
          (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        }) { i += 1; chars += 1 }
      } else if (b < 0x80) {
        if (!isWsByte(b)) bpe += 1
        if (b >= '0' && b <= '9') { if (!inWord) { words += 1; inWord = true } }
        else inWord = false
        chars += 1
        i += 1
      } else if (isU212A(bytes, i, n)) {
        bpe += 1; chars += 1
        if (!inWord) { words += 1; inWord = true }
        i += 3
      } else if (isU0130(bytes, i, n)) {
        bpe += 1; chars += 1
        if (!inWord) words += 1
        inWord = false // the combining dot closes the run after the i
        i += 2
      } else {
        bpe += 1; chars += 1; inWord = false
        i += math.min(seqLen(b), n - i)
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ws, bpe, chars, words))
  }

  def bigrams(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](n - 1)
    var prev = arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = arr.getUTF8String(i)
      out(i - 1) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def wordBuckets(u: UTF8String, buckets: Int): GenericArrayData = {
    val toks = wordTokens(u)
    val md = md5Local.get()
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(toks.getUTF8String(i).getBytes)
      val v = ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL)
      out(i) = v % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  // ------------------------------------------------- String-based twins
  /** Replica of `text.toLowerCase(Locale.ROOT).split("[^a-z0-9]+")
    * .filter(_.nonEmpty)` for the typed operator passes. Null-safe:
    * null tokenizes as empty (the Bpe.encode guard every typed pass
    * applies). */
  def lowerAlnum(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val n = text.length
    val out = new java.util.ArrayList[String](8)
    val sb = new java.lang.StringBuilder(32)
    @inline def close(): Unit =
      if (sb.length > 0) { out.add(sb.toString); sb.setLength(0) }
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (c == '\u212A') sb.append('k')
      else if (c == '\u0130') { sb.append('i'); close() }
      else close()
      i += 1
    }
    close()
    out.toArray(new Array[String](out.size))
  }

  /** Replica of `regexp_extract_all(text, bpeishPattern)` match
    * iteration for the typed encode passes: invokes `f` once per
    * pre-token, in order, with no regex engine. Null text = no tokens. */
  def bpeishEach(text: String)(f: String => Unit): Unit = {
    if (text == null) return
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
        val start = i
        i += 1
        while (i < n && {
          val d = text.charAt(i)
          (d >= 'A' && d <= 'Z') || (d >= 'a' && d <= 'z')
        }) i += 1
        f(text.substring(start, i))
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
                 c == '\f' || c == '\r') {
        i += 1
      } else if (Character.isHighSurrogate(c) && i + 1 < n &&
                 Character.isLowSurrogate(text.charAt(i + 1))) {
        // a supplementary code point is ONE [^A-Za-z0-9\s] match
        f(text.substring(i, i + 2)); i += 2
      } else {
        f(text.substring(i, i + 1)); i += 1
      }
    }
  }
}

object TokenExpressions {
  /** Column-API surface for [[WordTokensExpr]]. */
  def wordTokens(c: Column): Column =
    CatalystBridge.column(WordTokensExpr(CatalystBridge.expression(c)))

  /** Column-API surface for [[BpeishTokensExpr]]. */
  def bpeishTokens(c: Column): Column =
    CatalystBridge.column(BpeishTokensExpr(CatalystBridge.expression(c)))

  /** Column-API surface for [[TokenCountsExpr]] — a struct of
    * (ws_tokens, bpe_tokens, n_chars, word_tokens). */
  def tokenCounts(c: Column): Column =
    CatalystBridge.column(TokenCountsExpr(CatalystBridge.expression(c)))

  /** Column-API surface for [[BigramsExpr]] — array<struct<a,b>>. */
  def bigrams(c: Column): Column =
    CatalystBridge.column(BigramsExpr(CatalystBridge.expression(c)))

  /** Column-API surface for [[WordBucketsExpr]] — array<long>. */
  def wordBuckets(c: Column, buckets: Int): Column =
    CatalystBridge.column(WordBucketsExpr(CatalystBridge.expression(c), buckets))
}
