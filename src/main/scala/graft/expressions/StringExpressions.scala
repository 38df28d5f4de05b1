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
}
