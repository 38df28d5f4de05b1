package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Spark SQL has no canonical-composition function, and the alternative —
  * a Scala UDF — would break whole-stage codegen around the corpus scan's
  * hottest map stage (SURVEY §4's preference order: functions first,
  * custom codegen Expression second, UDF never). The generated code is a
  * single static call into [[StringNorm.nfc]], which fast-paths
  * already-normalized strings (the overwhelming case for real corpora:
  * `Normalizer.isNormalized` is a scan, not an allocation) and returns
  * the input UTF8String untouched so no bytes are copied unless
  * composition actually changes them. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    StringNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StringNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Full canonicalization (NFC + the whitespace/control contract of
  * [[graft.operators.TextAnalysis.normalizeText]]) as ONE codegen'd
  * expression.
  *
  * The first implementation ran the contract as a chain of five
  * `regexp_replace` steps after NFC. Semantically identical — and
  * measured 14x (not ~10x) for the sf1→sf10 decade: five intermediate
  * strings per document per pass is ~5x the corpus in garbage per scan,
  * and at 32 concurrent tasks the allocation rate turns into GC stalls
  * (GCLocker retries all over the sf10 bench log). This expression does
  * NFC plus ONE state-machine scan over the chars with at most one
  * output allocation, no regex; [[StringNorm.canonicalize]] documents
  * the scan's equivalence to the regex chain, and the DuckDB oracle
  * (which still runs the regex chain) certifies it end to end. */
case class TextCanonicalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "text_canonicalize"

  override def nullSafeEval(input: Any): Any =
    StringNorm.canonicalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StringNorm.canonicalize($c)")

  override protected def withNewChildInternal(newChild: Expression): TextCanonicalize =
    copy(child = newChild)
}

/** PII redaction (emails / IPv4s / phone-like runs) + the three audit
  * counts as ONE codegen'd expression returning a struct.
  *
  * The first implementation ran six independent Catalyst regex
  * expressions per document — three `regexp_extract_all` counts over the
  * original text and three nested `regexp_replace`s — six UTF8String ->
  * String conversions, three materialised intermediate documents, and
  * three boxed match arrays per row; it was the single most expensive
  * entry in the r10 bench profile. This expression converts the text
  * ONCE and runs five compiled-`Matcher` passes (email count+replace
  * share the original text, so they fuse into one pass) with at most
  * three output strings, none of which round-trips through a Column.
  * Match semantics are UNCHANGED: `java.util.regex` is exactly what
  * Spark's own regexp functions call, the patterns are byte-identical
  * ([[graft.operators.TextAnalysis.emailPattern]] etc.), and the
  * regex-chain form survives as
  * [[graft.operators.TextAnalysis.redactPiiRegex]] for the
  * equivalence spec + the DuckDB oracle, which still certifies this
  * end to end. */
case class PiiRedact(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = PiiScan.schema

  override def prettyName: String = "pii_redact"

  override def nullSafeEval(input: Any): Any =
    PiiScan.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PiiScan.scan($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiRedact =
    copy(child = newChild)
}

object PiiScan {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("redacted_text", StringType, nullable = false),
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false)))

  // Compiled once per JVM; patterns are the public TextAnalysis ones and
  // restrict themselves to Java/RE2-identical syntax (no lookaround, no
  // backrefs) so the DuckDB oracle stays engine-exact.
  private val email = java.util.regex.Pattern.compile(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  private val ip = java.util.regex.Pattern.compile(
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")
  private val phone = java.util.regex.Pattern.compile(
    "\\+?[0-9][0-9()\\- ]{7,14}[0-9]")

  /** Non-overlapping replace-all with a LITERAL replacement (no `$`
    * group refs, so the appendReplacement escaping machinery is skipped);
    * returns the input reference untouched when nothing matches — the
    * overwhelming case, and then no bytes are copied. Semantics match
    * `Matcher.find()` iteration exactly as Spark's RegexpReplace does. */
  private def replaceAll(p: java.util.regex.Pattern, s: String,
                         repl: String): String = {
    val m = p.matcher(s)
    if (!m.find()) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var last = 0
      do {
        sb.append(s, last, m.start()).append(repl)
        last = m.end()
      } while (m.find())
      sb.append(s, last, s.length).toString
    }
  }

  private def countAll(p: java.util.regex.Pattern, s: String): Long = {
    val m = p.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  /** Fused count + replace in ONE matcher pass — legal only when the
    * count's text and the replacement's text are the same String (no
    * earlier pattern replaced anything), which the caller guarantees
    * by reference equality. Returns the count; the replaced text (or
    * the input reference when nothing matched) lands in `outRef`. */
  private def countReplaceAll(p: java.util.regex.Pattern, s: String,
                              repl: String): (Long, String) = {
    val m = p.matcher(s)
    if (!m.find()) (0L, s)
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var n = 0L
      var last = 0
      do {
        n += 1
        sb.append(s, last, m.start()).append(repl)
        last = m.end()
      } while (m.find())
      sb.append(s, last, s.length)
      (n, sb.toString)
    }
  }

  /** Byte-level prescan: NECESSARY conditions for each pattern, checked
    * in one pass over the raw UTF-8 payload so the overwhelmingly
    * common no-PII document never constructs a String or runs a regex
    * engine at all. Soundness (a false skip is impossible):
    *  - email requires a literal '@' (single byte 0x40 in UTF-8 —
    *    multi-byte sequences only use bytes >= 0x80);
    *  - ip requires `[0-9]{1,3}\.` somewhere, i.e. a '.' immediately
    *    preceded by an ASCII digit;
    *  - phone requires a first digit and a final digit separated by
    *    8..15 characters ALL in `[0-9()\- ]` — every class char is
    *    single-byte ASCII, so inside such a run byte distance equals
    *    char distance, and any match implies a class run whose first
    *    and last digits are >= 8 bytes apart.
    * Bits: 1 = email possible, 2 = ip possible, 4 = phone possible. */
  private def prescan(u: UTF8String): Int = {
    val n = u.numBytes()
    var flags = 0
    var runFirstDigit = -1
    var prevDigit = false
    var i = 0
    while (i < n && flags != 7) {
      val c = u.getByte(i)
      val digit = c >= '0' && c <= '9'
      if (c == '@') flags |= 1
      if (c == '.' && prevDigit) flags |= 2
      if (digit || c == '(' || c == ')' || c == '-' || c == ' ') {
        if (digit) {
          if (runFirstDigit < 0) runFirstDigit = i
          else if (i - runFirstDigit >= 8) flags |= 4
        }
      } else runFirstDigit = -1
      prevDigit = digit
      i += 1
    }
    flags
  }

  /** Counts on the ORIGINAL text; replacement nests email -> ip -> phone
    * (a number inside an already-redacted span is not re-redacted) —
    * the exact contract of the regex-chain form. A byte prescan skips
    * each matcher whose necessary trigger bytes are absent ([[prescan]]
    * — exact, never a false skip), and count+replace fuse into one
    * matcher pass whenever the earlier patterns replaced nothing
    * (reference equality: the counted text IS the replaced text). */
  def scan(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val flags = prescan(u)
    if (flags == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](u, 0L, 0L, 0L))
    val s = u.toString
    var nEmails = 0L
    // email count + replace share the original text: one fused pass
    val afterEmail =
      if ((flags & 1) == 0) s
      else {
        val m = email.matcher(s)
        if (!m.find()) s
        else {
          val sb = new java.lang.StringBuilder(s.length)
          var last = 0
          do {
            nEmails += 1
            sb.append(s, last, m.start()).append("<EMAIL>")
            last = m.end()
          } while (m.find())
          sb.append(s, last, s.length).toString
        }
      }
    var nIps = 0L
    val afterIp =
      if ((flags & 2) == 0) afterEmail
      else if (afterEmail eq s) {
        val (n, out) = countReplaceAll(ip, s, "<IP>")
        nIps = n; out
      } else {
        nIps = countAll(ip, s)
        replaceAll(ip, afterEmail, "<IP>")
      }
    var nPhones = 0L
    val out =
      if ((flags & 4) == 0) afterIp
      else if (afterIp eq s) {
        val (n, o) = countReplaceAll(phone, s, "<PHONE>")
        nPhones = n; o
      } else {
        nPhones = countAll(phone, s)
        replaceAll(phone, afterIp, "<PHONE>")
      }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        if (out eq s) u else UTF8String.fromString(out),
        nEmails, nIps, nPhones))
  }
}

/** Token-sequence blocklist screen as ONE codegen'd scan.
  *
  * Generalizes the single-token screen to PHRASES: each entry is
  * tokenized with the corpus-side contract (lowercase, `[^a-z0-9]+`
  * splits), and an entry matches wherever its token sequence appears
  * contiguously in the document's tokens — "e-mail" screens as the
  * bigram (e, mail), so a real C4-style list's hyphenated and
  * multi-word entries screen instead of being rejected. Counting is
  * overlap-aware (position-based, matching the DuckDB oracle's index
  * comprehension): `n_blocked` sums match positions over all entries,
  * `n_distinct_blocked` counts entries that matched at least once.
  *
  * `key` is the '\n'-joined normalized entry list — a plain string, so
  * the expression stays trivially serializable; each executor JVM
  * compiles it once into a per-length token-sequence hash
  * ([[BlockScan.matcherFor]]) and every row is one tokenize + slide. */
case class BlocklistScreenExpr(child: Expression, key: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = BlockScan.schema

  override def prettyName: String = "blocklist_screen"

  override def nullSafeEval(input: Any): Any =
    BlockScan.scan(input.asInstanceOf[UTF8String], key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("blocklistKey", key, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.expressions.BlockScan.scan($c, $keyRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistScreenExpr =
    copy(child = newChild)
}

object BlockScan {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_blocked", LongType, nullable = false),
    StructField("n_distinct_blocked", LongType, nullable = false)))

  /** Entries grouped by token-sequence length: lookups per document are
    * (token count) × (distinct phrase lengths), independent of the
    * list's size. Entry indices drive the distinct-entry bitmap. */
  private final class Matcher(entries: Array[Array[String]]) {
    val nEntries: Int = entries.length
    val byLen: Array[(Int, java.util.HashMap[String, Integer])] = {
      val m = scala.collection.mutable.LinkedHashMap
        .empty[Int, java.util.HashMap[String, Integer]]
      entries.zipWithIndex.foreach { case (toks, idx) =>
        m.getOrElseUpdate(toks.length, new java.util.HashMap)
          .putIfAbsent(toks.mkString(" "), Integer.valueOf(idx))
      }
      m.toArray.sortBy(_._1)
    }
  }

  /** Per-JVM compiled-matcher cache. BOUNDED: a long-lived executor
    * screening with many distinct (or churning) blocklists must not
    * retain every list + matcher forever, so when a miss would grow
    * the cache past `cacheCap` the whole map is dropped first — the
    * realistic working set is one or two entries, hits stay lock-free
    * CHM reads, and a post-flush matcher simply recompiles on demand. */
  private val cacheCap = 8
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Matcher]()
  private def matcherFor(key: String): Matcher = {
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      if (cache.size >= cacheCap) cache.clear()
      cache.computeIfAbsent(key,
        k => new Matcher(k.split('\n').map(_.split(' '))))
    }
  }

  def scan(u: UTF8String, key: String): org.apache.spark.sql.catalyst.InternalRow = {
    val m = matcherFor(key)
    // corpus-side tokenization: the graft.functions.wordTokens contract
    // lower via UTF8String.toLowerCase — the SAME code path Spark's
    // lower() takes — so this scan and the regex/oracle form agree on
    // any JVM default locale (String.toLowerCase(ROOT) diverges from
    // Spark lower on e.g. tr_TR JVMs for dotted/dotless I)
    val toks = u.toLowerCase.toString
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    var total = 0L
    val seen = new Array[Boolean](m.nEntries)
    var li = 0
    while (li < m.byLen.length) {
      val (len, map) = m.byLen(li)
      val last = toks.length - len
      var i = 0
      while (i <= last) {
        val joined =
          if (len == 1) toks(i)
          else {
            val sb = new java.lang.StringBuilder(toks(i))
            var j = i + 1
            while (j < i + len) { sb.append(' ').append(toks(j)); j += 1 }
            sb.toString
          }
        val hit = map.get(joined)
        if (hit != null) { total += 1; seen(hit.intValue) = true }
        i += 1
      }
      li += 1
    }
    var d = 0L
    var s = 0
    while (s < seen.length) { if (seen(s)) d += 1; s += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, d))
  }
}

/** Language-ID stopword/script profile as ONE codegen'd text pass.
  *
  * The regex form ran FIVE `regexp_extract_all` passes per row (four
  * `\b(w1|...|w10)\b` alternations + a CJK class) and materialised the
  * match arrays just to `size` them; the sf10 stage profile measured
  * 21.2 s for the five-pass plan vs 1.7 s for one fused pass (12x).
  * This expression tokenizes the lowered text once — maximal runs of
  * Java-`\w` chars ([a-z0-9_] after lowering), which is EXACTLY the
  * token a `\b(word)\b` alternation of plain lowercase words can match,
  * so the counts are regex-identical (probe: 0 mismatches across sf10)
  * and the DuckDB oracle is untouched — looks each token up in the four
  * tiny stopword sets, and counts CJK chars in the same sweep over the
  * ORIGINAL text (the `[一-鿿]` class is BMP, so a char compare
  * matches the regex semantics). */
case class LangProfileExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = LangScan.schema

  override def prettyName: String = "lang_profile"

  override def nullSafeEval(input: Any): Any =
    LangScan.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.LangScan.scan($c)")

  override protected def withNewChildInternal(newChild: Expression): LangProfileExpr =
    copy(child = newChild)
}

object LangScan {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("cnt_en", LongType, nullable = false),
    StructField("cnt_de", LongType, nullable = false),
    StructField("cnt_fr", LongType, nullable = false),
    StructField("cnt_es", LongType, nullable = false),
    StructField("cnt_cjk", LongType, nullable = false)))

  // Parsed from the SAME patterns the oracle SQL embeds
  // (TextAnalysis.langStopwords), so the word lists cannot drift apart.
  private val sets: Array[java.util.HashSet[String]] =
    graft.operators.TextAnalysis.langStopwords.map { case (_, pat) =>
      val s = new java.util.HashSet[String]()
      pat.stripPrefix("\\b(").stripSuffix(")\\b").split('|').foreach(s.add)
      s
    }.toArray

  // longest stopword across the four lists: tokens longer than this can
  // never hit a set, so their substring is never allocated
  private val maxLen: Int = {
    var m = 0
    sets.foreach { s =>
      val it = s.iterator(); while (it.hasNext) m = math.max(m, it.next().length)
    }
    m
  }

  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_' ||
      (c >= 'A' && c <= 'Z')

  def scan(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = u.toString
    var cjk = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '一' && c <= '鿿') cjk += 1
      i += 1
    }
    // UTF8String.toLowerCase = Spark lower()'s path; keeps this scan
    // locale-agnostic and count-identical to the retained regex form
    val low = u.toLowerCase.toString
    val cnts = new Array[Long](4)
    var p = 0
    while (p < low.length) {
      if (isWord(low.charAt(p))) {
        var e = p + 1
        while (e < low.length && isWord(low.charAt(e))) e += 1
        if (e - p <= maxLen) {
          val tok = low.substring(p, e)
          var k = 0
          while (k < 4) { if (sets(k).contains(tok)) cnts(k) += 1; k += 1 }
        }
        p = e
      } else p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cnts(0), cnts(1), cnts(2), cnts(3), cjk))
  }
}

/** Quality-scoring character/token profile as ONE codegen'd text pass.
  *
  * [[graft.operators.TextAnalysis.qualityScore]] needed six counts per
  * row and computed them as three full-copy `regexp_replace` passes
  * (alpha/digit/whitespace strip, each allocating a stripped copy of
  * the document just to diff its length), a `split`-and-count (token
  * array allocated just to `size` it) and a stopword
  * `regexp_extract_all` (match array, same). This expression computes
  * all six in one sweep, replicating each source's exact semantics:
  *
  *  - `n_chars` counts CODE POINTS (Spark `length`), not UTF-16 units;
  *  - `n_alpha`/`n_digits`/`n_ws` count `[A-Za-z]`/`[0-9]`/Java-regex
  *    `\s` chars (all ASCII classes, so unit==codepoint counting);
  *  - `n_tokens` replicates `size(split(trim(text), "\\s+"))` with
  *    Spark's limit=-1 split semantics on the space-only-trimmed
  *    string: maximal non-`\s` runs, PLUS one boundary empty on each
  *    side that still starts/ends with non-space whitespace (and the
  *    all-space doc short-circuits to 0 exactly like the `when` guard);
  *  - `n_stops` replicates the `\b(stopword)\b` alternation count via
  *    the same Java-`\w` token-run argument as [[LangProfileExpr]].
  *
  * Equivalence is pinned by an adversarial spec against the retained
  * regex form and certified by the unchanged DuckDB oracles of every
  * quality consumer. */
case class QualityProfileExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = QualityScan.schema

  override def prettyName: String = "quality_profile"

  override def nullSafeEval(input: Any): Any =
    QualityScan.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.QualityScan.scan($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityProfileExpr =
    copy(child = newChild)
}

object QualityScan {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_digits", LongType, nullable = false),
    StructField("n_ws", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stops", LongType, nullable = false)))

  // Parsed from the SAME pattern the oracle SQL embeds
  // (TextAnalysis.enStopwords), so the word list cannot drift apart.
  private val stops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.operators.TextAnalysis.enStopwords
      .stripPrefix("\\b(").stripSuffix(")\\b").split('|').foreach(s.add)
    s
  }
  private val stopMaxLen: Int = {
    var m = 0
    val it = stops.iterator(); while (it.hasNext) m = math.max(m, it.next().length)
    m
  }

  // Java regex \s — ASCII only: [ \t\n\x0B\f\r]
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_' ||
      (c >= 'A' && c <= 'Z')

  def scan(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = u.toString
    var alpha = 0L; var digits = 0L; var ws = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha += 1
      else if (c >= '0' && c <= '9') digits += 1
      else if (isWs(c)) ws += 1
      i += 1
    }
    val nChars = s.codePointCount(0, s.length).toLong
    // n_tokens on the space-only-trimmed string (Spark trim strips 0x20)
    var lo = 0; var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var toks = 0L
    if (hi > lo) {
      var runs = 0L
      var inRun = false
      var j = lo
      while (j < hi) {
        val w = !isWs(s.charAt(j))
        if (w && !inRun) runs += 1
        inRun = w
        j += 1
      }
      toks = runs
      if (isWs(s.charAt(lo))) toks += 1  // split keeps the leading empty
      if (isWs(s.charAt(hi - 1))) toks += 1 // limit=-1 keeps the trailing one
    }
    // stopword hits on the lowered text, \b-equivalent token runs;
    // UTF8String.toLowerCase = Spark lower()'s locale-agnostic path
    val low = u.toLowerCase.toString
    var nStops = 0L
    var p = 0
    while (p < low.length) {
      if (isWord(low.charAt(p))) {
        var e = p + 1
        while (e < low.length && isWord(low.charAt(e))) e += 1
        if (e - p <= stopMaxLen && stops.contains(low.substring(p, e))) nStops += 1
        p = e
      } else p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, alpha, digits, ws, toks, nStops))
  }
}

/** Static helper the generated code calls (top-level Scala objects emit
  * static forwarders, so `StringNorm.nfc(...)` is valid generated Java). */
object StringNorm {
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** One-pass equivalent of the normalization regex chain
    * (CRLF/CR -> LF; strip `\x00-\x08 \x0B \x0C \x0E-\x1F \x7F`;
    * collapse tab/space runs to one space; drop spaces adjacent to
    * newlines; collapse 3+ newlines to two; trim spaces/newlines).
    * Pending-whitespace state machine: spaces and newlines are buffered
    * as counters and materialised only when a visible char follows —
    * which makes adjacency, run-collapse, and both trims fall out of
    * one rule: newlines dominate spaces, two newlines max, nothing
    * pending is emitted at the start or the end. */
  def canonicalize(u: UTF8String): UTF8String = {
    val composed = nfc(u)
    val s = composed.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var pendingNl = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val ch =
        if (c == '\r') { if (i + 1 < n && s.charAt(i + 1) == '\n') i += 1; '\n' }
        else c
      if (ch == '\n') { pendingNl += 1; pendingSpace = false }
      else if (ch == ' ' || ch == '\t') pendingSpace = true
      else if (ch < ' ' || ch == '\u007f') () // strip remaining controls
      else {
        if (pendingNl > 0) {
          if (out.length > 0) out.append(if (pendingNl == 1) "\n" else "\n\n")
        } else if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false; pendingNl = 0
        out.append(ch)
      }
      i += 1
    }
    val r = out.toString
    if (r == s) composed else UTF8String.fromString(r)
  }
}

object StringExpressions {
  /** Column-API surface for [[NfcNormalize]]. */
  def nfc(c: Column): Column =
    CatalystBridge.column(NfcNormalize(CatalystBridge.expression(c)))

  /** Column-API surface for [[TextCanonicalize]]. */
  def canonicalize(c: Column): Column =
    CatalystBridge.column(TextCanonicalize(CatalystBridge.expression(c)))

  /** Column-API surface for [[PiiRedact]] — a struct of
    * (redacted_text, n_emails, n_ips, n_phones). */
  def piiScan(c: Column): Column =
    CatalystBridge.column(PiiRedact(CatalystBridge.expression(c)))

  /** Column-API surface for [[BlocklistScreenExpr]] — a struct of
    * (n_blocked, n_distinct_blocked). `key` is the '\n'-joined
    * normalized entry list (see [[graft.operators.TextAnalysis
    * .blocklistScreen]], which builds it). */
  def blocklistScreen(c: Column, key: String): Column =
    CatalystBridge.column(BlocklistScreenExpr(CatalystBridge.expression(c), key))

  /** Column-API surface for [[LangProfileExpr]] — a struct of
    * (cnt_en, cnt_de, cnt_fr, cnt_es, cnt_cjk). */
  def langProfile(c: Column): Column =
    CatalystBridge.column(LangProfileExpr(CatalystBridge.expression(c)))

  /** Column-API surface for [[QualityProfileExpr]] — a struct of
    * (n_chars, n_alpha, n_digits, n_ws, n_tokens, n_stops). */
  def qualityProfile(c: Column): Column =
    CatalystBridge.column(QualityProfileExpr(CatalystBridge.expression(c)))
}
