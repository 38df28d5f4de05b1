package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{DoubleDotProduct, SortedIntersectCount}

/** Session extension installing graft's native expressions into the SQL
  * function registry, so `spark.sql("SELECT double_dot_product(a, b)")`
  * works next to the built-ins. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `Sessions.local()` — the Column API (`functions.dotProduct`) does not
  * need it. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("double_dot_product"),
      new ExpressionInfo(classOf[DoubleDotProduct].getName, "double_dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "double_dot_product(arrayA, arrayB) takes 2 arguments")
        DoubleDotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      // the merge-scan CONTRACT belongs in DESCRIBE FUNCTION output: a
      // SQL user who feeds unsorted or duplicate-bearing arrays gets a
      // silent undercount (exactly like unsorted input to a merge
      // join), and null elements are rejected at analysis time
      new ExpressionInfo(classOf[SortedIntersectCount].getName, null,
        "sorted_intersect_count",
        "sorted_intersect_count(a, b) - Returns |a ∩ b| for two " +
          "array<bigint> columns via one allocation-free merge scan. " +
          "CONTRACT: both arrays must be sorted ascending with distinct " +
          "elements; unsorted or duplicate input silently undercounts. " +
          "A null element in either array makes the result NULL.",
        "> SELECT sorted_intersect_count(array(1L, 3L, 7L), array(3L, 7L, 9L));\n   2"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "sorted_intersect_count(sortedArrayA, sortedArrayB) takes 2 arguments")
        SortedIntersectCount(args.head, args(1))
      }))
  }
}
