package graft

import org.apache.spark.sql.types._
import graft.operators.{SchemaEvolution, SchemaRegistry}
import graft.operators.SchemaEvolution.ColumnSpec

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "a", "x"), (2, "b", "y")).toDF("id", "name", "extra")

  test("validate reports missing and wrong-typed columns") {
    val errs = SchemaEvolution.validate(df, Seq(
      ColumnSpec("id", LongType), ColumnSpec("ghost", StringType)))
    assert(errs.map(e => (e.column, e.problem.split(",").head)).toSet ==
      Set(("ghost", "missing"), ("id", "type int")))
  }

  test("validate flags extras when not allowed") {
    val errs = SchemaEvolution.validate(df,
      Seq(ColumnSpec("id", IntegerType), ColumnSpec("name", StringType)),
      allowExtraColumns = false)
    assert(errs == Seq(SchemaEvolution.ValidationError("extra", "unexpected")))
  }

  test("coerce casts, fills defaults, nulls, and drops extras in declared order") {
    val out = SchemaEvolution.coerce(df, Seq(
      ColumnSpec("id", LongType),
      ColumnSpec("name", StringType),
      ColumnSpec("tier", StringType, default = Some("STD")),
      ColumnSpec("note", StringType)))
    assert(out.columns.toSeq == Seq("id", "name", "tier", "note"))
    assert(out.schema("id").dataType == LongType)
    val r = out.orderBy("id").head()
    assert(r.getLong(0) == 1L && r.getString(2) == "STD" && r.isNullAt(3))
  }

  test("evolve keeps extras when dropExtra=false, rejects impossible schemas") {
    val kept = SchemaEvolution.evolve(df,
      Seq(ColumnSpec("id", LongType)), dropExtra = false)
    assert(kept.columns.toSet == Set("id", "name", "extra"))
    intercept[IllegalArgumentException] {
      SchemaEvolution.evolve(df,
        Seq(ColumnSpec("must_have", LongType, nullable = false)))
    }
  }

  test("schema registry versions") {
    val reg = new SchemaRegistry
    reg.register("cust", 1, Seq(ColumnSpec("id", LongType)))
    reg.register("cust", 2, Seq(ColumnSpec("id", LongType), ColumnSpec("name", StringType)))
    assert(reg.latestVersion("cust").contains(2))
    assert(reg.latest("cust").get.size == 2)
    assert(reg.get("cust", 1).get.size == 1)
  }
}
