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

/** Negative fixture: a Function1, but the WRONG specialization — type
  * erasure would let this through a bare `case fn: Function1[_, _]`
  * match and only explode mid-pipeline with a ClassCastException. */
class WrongTypedTransform extends (String => String) {
  def apply(s: String): String = s.toUpperCase
}

/** Positive fixture for the erased-generic shape: the only apply the
  * subclass exposes is the inherited (Object)Object form — statically
  * undecidable, must stay accepted. */
class GenericBase[A] extends (A => A) {
  def apply(a: A): A = a
}
class GenericIdentityTransform extends GenericBase[DataFrame]

/** Alternative implementation registered under a colliding name by a
  * spec — used to pin that the spec's class, not the prior
  * registration, is what runs. */
class TripleVTransform extends (DataFrame => DataFrame) {
  def apply(df: DataFrame): DataFrame = df.withColumn("v", col("v") * 3)
}
