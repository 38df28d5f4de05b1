package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Column-level schema declaration, validation, coercion, and additive
  * evolution.
  *
  * Reference: src/pipeline/transformation/schema_validator.py:98
  * (`validate`), :192 (type coercion), :239 (defaults for missing
  * columns), :259 (schema registry). Spark-first re-expression: the
  * declared schema compiles to a single `select` of cast/default `Column`
  * expressions — one projection, codegen'd, no per-row type dispatch.
  */
object SchemaEvolution {

  /** One declared column (reference schema entries carry
    * name/dtype/nullable/default). */
  case class ColumnSpec(name: String,
                        dataType: DataType,
                        nullable: Boolean = true,
                        default: Option[Any] = None)

  case class ValidationError(column: String, problem: String)

  /** Non-mutating validation (reference `validate` with strict=True):
    * returns all violations instead of raising on the first. */
  def validate(df: DataFrame, schema: Seq[ColumnSpec],
               allowExtraColumns: Boolean = true): Seq[ValidationError] = {
    val actual = df.schema.map(f => f.name -> f).toMap
    val declared = schema.map(_.name).toSet
    val missing = schema.filterNot(s => actual.contains(s.name)).map(s =>
      ValidationError(s.name, "missing"))
    val wrongType = schema.flatMap { s =>
      actual.get(s.name).collect {
        case f if f.dataType != s.dataType =>
          ValidationError(s.name, s"type ${f.dataType.simpleString}, expected ${s.dataType.simpleString}")
      }
    }
    val extra =
      if (allowExtraColumns) Nil
      else df.columns.filterNot(declared.contains).map(c => ValidationError(c, "unexpected")).toSeq
    missing ++ wrongType ++ extra
  }

  /** Coerce `df` to the declared schema:
    *  - present columns cast to the declared type (reference :192);
    *  - missing columns materialise as their default (or typed NULL)
    *    — additive schema evolution (reference :239);
    *  - `dropExtra=true` projects extras away, otherwise they pass
    *    through after the declared columns.
    * Output column order is the declared order (deterministic contract
    * for downstream writers). */
  def coerce(df: DataFrame, schema: Seq[ColumnSpec],
             dropExtra: Boolean = true): DataFrame = {
    val present = df.columns.toSet
    val declaredCols: Seq[Column] = schema.map { s =>
      if (present.contains(s.name)) col(s.name).cast(s.dataType).as(s.name)
      else s.default match {
        case Some(v) => lit(v).cast(s.dataType).as(s.name)
        case None    => lit(null).cast(s.dataType).as(s.name)
      }
    }
    val extraCols: Seq[Column] =
      if (dropExtra) Nil
      else df.columns.filterNot(schema.map(_.name).contains).map(col).toSeq
    df.select(declaredCols ++ extraCols: _*)
  }

  /** Structural diff between two schema versions (reference
    * `compare_schemas`, schema_validator.py): added / removed / changed
    * columns — the inputs to an evolution or migration decision. */
  case class SchemaDiff(added: Seq[String], removed: Seq[String],
                        changed: Seq[(String, String, String)])

  def compareSchemas(from: Seq[ColumnSpec], to: Seq[ColumnSpec]): SchemaDiff = {
    val f = from.map(s => s.name -> s).toMap
    val t = to.map(s => s.name -> s).toMap
    SchemaDiff(
      added = to.map(_.name).filterNot(f.contains),
      removed = from.map(_.name).filterNot(t.contains),
      changed = to.flatMap { s =>
        f.get(s.name).collect {
          case old if old.dataType != s.dataType =>
            (s.name, old.dataType.simpleString, s.dataType.simpleString)
        }
      })
  }

  /** validate-then-coerce, the reference's `validate(..., strict=False)`
    * path: coerce what can be coerced, raise only on non-nullable
    * declared columns that are entirely absent with no default. */
  def evolve(df: DataFrame, schema: Seq[ColumnSpec],
             dropExtra: Boolean = true): DataFrame = {
    val fatal = schema.filter(s =>
      !s.nullable && s.default.isEmpty && !df.columns.contains(s.name))
    if (fatal.nonEmpty)
      throw new IllegalArgumentException(
        s"non-nullable columns missing without default: ${fatal.map(_.name).mkString(",")}")
    coerce(df, schema, dropExtra)
  }
}

/** Versioned schema registry: in-memory cache with optional durable
  * backing on shared storage.
  *
  * Reference: schema_validator.py:259 (`register_schema` — memory cache +
  * DB registry table), :347 (`load_schema` — cache first, then DB), :446
  * (`get_schema_history`). `backingDir = Some(path)` gives the durable
  * behavior — schemas registered in one session load in a fresh one; the
  * default stays in-memory like the reference's no-connection-manager
  * fallback. */
class SchemaRegistry(backingDir: Option[String] = None) {
  import SchemaEvolution.ColumnSpec
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private val schemas = mutable.Map[(String, Int), Seq[ColumnSpec]]()
  private val backing = backingDir.map(new graft.pipeline.DurableRegistry(_))

  def register(name: String, version: Int, schema: Seq[ColumnSpec],
               description: String = ""): Unit = {
    backing.foreach(_.put(name, version, schemaToJson(schema), description))
    schemas((name, version)) = schema
  }

  /** Cache first, then durable backing (reference `load_schema`). */
  def get(name: String, version: Int): Option[Seq[ColumnSpec]] =
    schemas.get((name, version)).orElse {
      val loaded = backing.flatMap(_.get(name, version)).map(schemaFromJson)
      loaded.foreach(s => schemas((name, version)) = s)
      loaded
    }

  def latestVersion(name: String): Option[Int] = {
    val vs = schemas.keys.collect { case (n, v) if n == name => v } ++
      backing.flatMap(_.latestVersion(name))
    if (vs.nonEmpty) Some(vs.max) else None
  }

  def latest(name: String): Option[Seq[ColumnSpec]] =
    latestVersion(name).flatMap(v => get(name, v))

  /** (version, description) history, oldest first (reference
    * `get_schema_history`). In-memory registrations carry no description
    * unless backed. */
  def history(name: String): Seq[(Int, String)] =
    backing.map(_.history(name)).getOrElse(
      schemas.keys.collect { case (n, v) if n == name => (v, "") }
        .toSeq.sortBy(_._1))

  /** ColumnSpec <-> JSON via Spark's own DataType json codec; defaults
    * carried as JSON primitives (cast back through the declared type when
    * the schema is applied, so primitive fidelity is sufficient). */
  private def schemaToJson(schema: Seq[ColumnSpec]): String =
    JsonMethods.compact(JsonMethods.render(JArray(schema.map { s =>
      JObject(
        "name" -> JString(s.name),
        "dataType" -> JsonMethods.parse(s.dataType.json),
        "nullable" -> JBool(s.nullable),
        "default" -> (s.default match {
          case None             => JNothing
          case Some(null)       => JNull
          case Some(b: Boolean) => JBool(b)
          case Some(n: Int)     => JLong(n.toLong)
          case Some(n: Long)    => JLong(n)
          case Some(n: Double)  => JDouble(n)
          case Some(v)          => JString(v.toString)
        }))
    }.toList)))

  private def schemaFromJson(json: String): Seq[ColumnSpec] = {
    val JArray(items) = JsonMethods.parse(json): @unchecked
    items.map { item =>
      val JString(name) = (item \ "name"): @unchecked
      val dt = DataType.fromJson(JsonMethods.compact(JsonMethods.render(item \ "dataType")))
      val JBool(nullable) = (item \ "nullable"): @unchecked
      val default = item \ "default" match {
        case JNothing    => None
        case JNull       => Some(null)
        case JBool(b)    => Some(b)
        case JLong(n)    => Some(n)
        case JInt(n)     => Some(n.toLong)
        case JDouble(n)  => Some(n)
        case JString(s)  => Some(s)
        case other       => Some(JsonMethods.compact(JsonMethods.render(other)))
      }
      ColumnSpec(name, dt, nullable, default)
    }
  }
}
