package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * `aggregate(zip_with(a, b, *), 0d, +)` is semantically a dot product
  * but executes as an interpreted higher-order-function chain
  * (CodegenFallback + a materialised product array per pair). On an
  * all-pairs similarity join that interpreter overhead dominates the
  * arithmetic ~50:1. This expression generates a tight primitive loop
  * inside whole-stage codegen instead — the preference order SURVEY §4
  * mandates: functions first, custom codegen Expression second, UDF never.
  */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "double_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-API surface for [[DoubleDotProduct]]. Inputs must already be
    * array<double> (cast with [[graft.functions.vecD]]). */
  def dotD(a: Column, b: Column): Column =
    CatalystBridge.column(DoubleDotProduct(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
