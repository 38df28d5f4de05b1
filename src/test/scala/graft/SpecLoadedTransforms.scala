package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixtures for CodeTransform's load-from-path: transform
  * implementations resolved ONLY by class name from pipeline specs,
  * never registered programmatically — the class-based and object-based
  * shapes a spec author would actually ship (reference
  * code_transformer.py:164 `_load_function_from_path`). */
class DoubleVTransform extends (DataFrame => DataFrame) {
  def apply(df: DataFrame): DataFrame = df.withColumn("v", col("v") * 2)
}

/** Scala-object form — resolved via the `MODULE$` singleton field. */
object TagSourceTransform extends (DataFrame => DataFrame) {
  def apply(df: DataFrame): DataFrame = df.withColumn("tagged", lit(true))
}

/** Negative fixture: present on the classpath but NOT a Function1. */
class NotATransform
