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

  // ---- load-from-path (reference code_transformer.py:164
  //      `_load_function_from_path`, :209 `_load_function_from_module`) ----
  /** Resolve a transform implementation from the session CLASSPATH by
    * fully-qualified name — the JVM analog of the reference's dynamic
    * function loading, which lets a JSON pipeline spec name a transform
    * the launching program never registered. The class must implement
    * `DataFrame => DataFrame` (Scala `Function1`); both plain classes
    * (no-arg constructor) and Scala `object`s (resolved via `MODULE$`)
    * work, and the trailing-`$` object form is tried automatically.
    * Resolution happens EAGERLY so a typo'd class name fails at
    * registration, not mid-pipeline; the apply itself stays a lazy plan
    * builder like every registered transform. */
  def loadClass(className: String): Fn = {
    // context classloader first: that is where Spark puts `--jars`
    // user code (and where an embedding application's classes live
    // when this library sits in a parent loader); fall back to our own.
    val loader = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(getClass.getClassLoader)
    def resolve(cn: String) = Class.forName(cn, true, loader)
    val cls =
      try resolve(className)
      catch {
        case _: ClassNotFoundException =>
          try resolve(className + "$")
          catch {
            case _: ClassNotFoundException => throw new IllegalArgumentException(
              s"transform class not found on the session classpath: $className")
          }
      }
    // a Scala `object Foo` compiles to BOTH Foo (static forwarders, no
    // constructor) and Foo$ (the MODULE$ singleton) — so try the
    // singleton on the resolved class, then on its `$` twin, and only
    // then a no-arg constructor
    def singleton(c: Class[_]): Option[Any] =
      try Some(c.getField("MODULE$").get(null))
      catch { case _: NoSuchFieldException => None }
    val inst = singleton(cls)
      .orElse {
        try singleton(resolve(cls.getName + "$"))
        catch { case _: ClassNotFoundException => None }
      }
      .getOrElse {
        try cls.getDeclaredConstructor().newInstance()
        catch {
          case _: NoSuchMethodException => throw new IllegalArgumentException(
            s"$className has neither a no-arg constructor nor a MODULE$$ singleton")
        }
      }
    inst match {
      case fn: Function1[_, _] =>
        // Type erasure makes the pattern above match ANY Function1 —
        // a `String => String` class would pass registration and only
        // fail mid-pipeline with an opaque ClassCastException,
        // breaking the fails-at-registration contract. So verify the
        // concrete apply signature reflectively where one is visible:
        // Scala compiles a class that directly implements
        // `DataFrame => DataFrame` with a typed apply(Dataset):Dataset
        // beside the erased bridge, so a typed apply that cannot
        // accept a Dataset (or cannot return one) is proof of a wrong
        // specialization — rejected HERE, eagerly. A class whose only
        // apply is the erased (Object)Object form (generic
        // indirection, e.g. `class Base[A] extends (A => A)`) is
        // statically undecidable and stays accepted.
        val ds = classOf[org.apache.spark.sql.Dataset[_]]
        val typedApplies = inst.getClass.getMethods.toSeq.filter(m =>
          m.getName == "apply" && m.getParameterCount == 1 && !m.isBridge &&
            !(m.getParameterTypes()(0) == classOf[Object] &&
              m.getReturnType == classOf[Object]))
        val compatible = typedApplies.exists(m =>
          m.getParameterTypes()(0).isAssignableFrom(ds) &&
            (ds.isAssignableFrom(m.getReturnType) ||
              m.getReturnType == classOf[Object]))
        if (typedApplies.nonEmpty && !compatible) {
          val sig = typedApplies.map(m =>
            s"(${m.getParameterTypes()(0).getSimpleName}) => " +
              m.getReturnType.getSimpleName).mkString(", ")
          throw new IllegalArgumentException(
            s"$className is a Function1 but not DataFrame => DataFrame: " +
              s"apply signature is $sig")
        }
        df => fn.asInstanceOf[Fn](df)
      case _ => throw new IllegalArgumentException(
        s"$className does not implement DataFrame => DataFrame (Function1)")
    }
  }

  /** Register a classpath-resolved transform under the versioned
    * registry (the reference's loaded functions enter the same registry
    * as programmatic ones). */
  def registerClass(name: String, version: Int, className: String): Unit =
    register(name, version, loadClass(className), s"class:$className")

  /** Idempotent spec-driven form: a `{"type":"code","class":...}`
    * pipeline stage resolves and registers the class once per registry,
    * then every later run with the SAME class reuses the registration —
    * so repeated pipeline runs don't grow the version history. A spec
    * declaring a DIFFERENT class under an already-taken name must never
    * silently run the old implementation (the spec says class X; class Y
    * executing is a correctness defect with no error anywhere), so a
    * mismatch against the latest registration's recorded `class:<fqcn>`
    * docstring registers the spec's class as a NEW version — what the
    * spec names is what runs, and the version history records the
    * change. This also covers a programmatic registration shadowed by a
    * class-declaring spec: the explicit class wins under a new version. */
  def registerClassIfAbsent(name: String, className: String): Unit =
    synchronized {
      latestVersion(name) match {
        case None => registerClass(name, 1, className)
        case Some(v) =>
          val desc = history.collectFirst {
            case (n, ver, d) if n == name && ver == v => d
          }
          if (!desc.contains(s"class:$className"))
            registerClass(name, v + 1, className)
      }
    }
}
