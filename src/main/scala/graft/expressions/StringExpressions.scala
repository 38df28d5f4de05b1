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

/** Static helper the generated code calls (top-level Scala objects emit
  * static forwarders, so `StringNorm.nfc(...)` is valid generated Java). */
object StringNorm {
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

object StringExpressions {
  /** Column-API surface for [[NfcNormalize]]. */
  def nfc(c: Column): Column =
    CatalystBridge.column(NfcNormalize(CatalystBridge.expression(c)))
}
