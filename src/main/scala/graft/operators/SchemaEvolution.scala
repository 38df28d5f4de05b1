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

/** Versioned schema registry, in-memory (reference
  * schema_validator.py:259; the DB-backed variant is a deployment
  * concern, not an engine one). */
class SchemaRegistry {
  import SchemaEvolution.ColumnSpec
  private val schemas = mutable.Map[(String, Int), Seq[ColumnSpec]]()

  def register(name: String, version: Int, schema: Seq[ColumnSpec]): Unit =
    schemas((name, version)) = schema

  def get(name: String, version: Int): Option[Seq[ColumnSpec]] =
    schemas.get((name, version))

  def latestVersion(name: String): Option[Int] = {
    val vs = schemas.keys.collect { case (n, v) if n == name => v }
    if (vs.nonEmpty) Some(vs.max) else None
  }

  def latest(name: String): Option[Seq[ColumnSpec]] =
    latestVersion(name).flatMap(v => get(name, v))
}
