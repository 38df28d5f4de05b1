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

  /** Counts on the ORIGINAL text; replacement nests email -> ip -> phone
    * (a number inside an already-redacted span is not re-redacted) —
    * the exact contract of the regex-chain form. */
  def scan(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = u.toString
    var nEmails = 0L
    // email count + replace share the original text: one fused pass
    val m = email.matcher(s)
    val afterEmail =
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
    val nIps = countAll(ip, s)
    val afterIp = replaceAll(ip, afterEmail, "<IP>")
    val nPhones = countAll(phone, s)
    val out = replaceAll(phone, afterIp, "<PHONE>")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        if (out eq s) u else UTF8String.fromString(out),
        nEmails, nIps, nPhones))
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
}
