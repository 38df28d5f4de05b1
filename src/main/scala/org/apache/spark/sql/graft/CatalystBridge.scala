package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. `ExpressionUtils` is `private[sql]`, so
  * this one-file shim lives under the `org.apache.spark.sql` package —
  * the established pattern for libraries that add native Catalyst
  * expressions (the alternative, SparkSessionExtensions function
  * registration, requires controlling session construction, which the
  * driver harness does not give us). Everything else in graft stays in
  * its own namespace. */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
