package graft.operators

import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** Code-defined transformation: arbitrary `DataFrame => DataFrame`
  * functions with a versioned registry.
  *
  * Reference: src/pipeline/transformation/code_transformer.py:44
  * (`transform` applies a Python callable), :236 (class-based transforms
  * with a registry). The Spark analogue keeps the transform itself a plan
  * builder — the function returns a new lazy DataFrame, so user code
  * composes with Catalyst optimization instead of materialising rows.
  */
class CodeTransform {
  type Fn = DataFrame => DataFrame
  private val registry = mutable.Map[(String, Int), Fn]()

  /** Apply a transform function directly (reference `transform`, :44). */
  def transform(df: DataFrame, fn: Fn): DataFrame = fn(df)

  /** Apply a chain of transforms left-to-right (reference supports
    * pipelines of callables). */
  def transformChain(df: DataFrame, fns: Seq[Fn]): DataFrame =
    fns.foldLeft(df)((acc, fn) => fn(acc))

  private val history = mutable.ArrayBuffer[(String, Int, String)]()

  // ---- versioned registry (reference code_transformer.py:236) ----
  def register(name: String, version: Int, fn: Fn, description: String = ""): Unit = {
    registry((name, version)) = fn
    history += ((name, version, description))
  }

  /** Registration history, oldest first (reference
    * `get_transformation_history`). */
  def transformationHistory(name: String): Seq[(Int, String)] =
    history.collect { case (n, v, d) if n == name => (v, d) }.toSeq

  def get(name: String, version: Int): Option[Fn] = registry.get((name, version))

  def latestVersion(name: String): Option[Int] = {
    val vs = registry.keys.collect { case (n, v) if n == name => v }
    if (vs.nonEmpty) Some(vs.max) else None
  }

  def transformNamed(df: DataFrame, name: String,
                     version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(name))
      .getOrElse(throw new NoSuchElementException(s"no versions for $name"))
    val fn = get(name, v)
      .getOrElse(throw new NoSuchElementException(s"no transform $name v$v"))
    fn(df)
  }
}
