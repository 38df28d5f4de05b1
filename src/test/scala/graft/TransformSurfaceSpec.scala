package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators._
import graft.operators.SchemaEvolution.ColumnSpec

/** Coverage mirroring the reference's remaining unit surface
  * (tests/unit/test_sql_transformer.py, test_code_transformer.py,
  * test_schema_validator.py `compare_schemas`, config-from-file,
  * empty-input behavior). */
class TransformSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq((1L, "alice", 30), (2L, "bob", 25)).toDF("id", "name", "age")

  test("sql transform with named parameters") {
    val st = new SqlTransform(spark)
    val out = st.transformParams(people,
      "SELECT id, name FROM input_data WHERE age > :min_age",
      Map("min_age" -> 26))
    assert(out.as[(Long, String)].collect().toSeq == Seq((1L, "alice")))
  }

  test("sql/code registries keep transformation history") {
    val st = new SqlTransform(spark)
    st.registerQueryVersion("q", 1, "SELECT 1", "initial")
    st.registerQueryVersion("q", 2, "SELECT 2", "fixed bug")
    assert(st.transformationHistory("q") == Seq((1, "initial"), (2, "fixed bug")))
    val ct = new CodeTransform
    ct.register("f", 1, identity, "v1")
    assert(ct.transformationHistory("f") == Seq((1, "v1")))
  }

  test("code transform loads implementations from the classpath by name") {
    // reference code_transformer.py:164/:209 parity: a spec can name a
    // DataFrame=>DataFrame class the launching program never registered
    val ct = new CodeTransform
    val in = Seq((1L, 3L), (2L, 4L)).toDF("id", "v")
    // plain class (no-arg constructor)
    ct.registerClass("double_v", 1, "graft.DoubleVTransform")
    assert(ct.transformNamed(in, "double_v").select("v")
      .as[Long].collect().sorted.toSeq == Seq(6L, 8L))
    assert(ct.transformationHistory("double_v")
      == Seq((1, "class:graft.DoubleVTransform")))
    // Scala object (MODULE$ singleton), trailing-$ tried automatically
    ct.registerClass("tag", 1, "graft.TagSourceTransform")
    assert(ct.transformNamed(in, "tag").columns.contains("tagged"))
    // idempotent spec-driven form never grows the version history
    ct.registerClassIfAbsent("double_v", "graft.DoubleVTransform")
    assert(ct.latestVersion("double_v").contains(1))
    // failures are EAGER and descriptive: unknown class, wrong shape
    val missing = intercept[IllegalArgumentException] {
      ct.loadClass("graft.NoSuchTransform")
    }
    assert(missing.getMessage.contains("not found"))
    val wrongShape = intercept[IllegalArgumentException] {
      ct.loadClass("graft.NotATransform")
    }
    assert(wrongShape.getMessage.contains("Function1"))
    // erasure does NOT smuggle a wrong specialization through: a
    // String => String class fails AT REGISTRATION with the signature
    // in the message, not mid-pipeline with a ClassCastException
    val wrongType = intercept[IllegalArgumentException] {
      ct.loadClass("graft.WrongTypedTransform")
    }
    assert(wrongType.getMessage.contains("String"))
    // …while a generic-indirection class whose only visible apply is
    // the erased (Object)Object form stays accepted (undecidable)
    assert(ct.loadClass("graft.GenericIdentityTransform")(in)
      .count() == 2)
  }

  test("registerClassIfAbsent: same class reuses, different class registers a new version") {
    import org.apache.spark.sql.DataFrame
    val ct = new CodeTransform
    val in = Seq((1L, 3L)).toDF("id", "v")
    ct.registerClassIfAbsent("scale_v", "graft.DoubleVTransform")
    ct.registerClassIfAbsent("scale_v", "graft.DoubleVTransform")
    assert(ct.latestVersion("scale_v").contains(1)) // idempotent re-runs
    // a spec naming a DIFFERENT class under the taken name must run ITS
    // class (new version), never silently execute the old one
    ct.registerClassIfAbsent("scale_v", "graft.TripleVTransform")
    assert(ct.latestVersion("scale_v").contains(2))
    assert(ct.transformNamed(in, "scale_v").select("v")
      .as[Long].collect().toSeq == Seq(9L))
    // version 1 remains addressable — history, not replacement
    assert(ct.transformNamed(in, "scale_v", Some(1)).select("v")
      .as[Long].collect().toSeq == Seq(6L))
    // a programmatic registration shadowed by a class-declaring spec:
    // the explicitly named class wins under a new version
    val ct2 = new CodeTransform
    ct2.register("prog", 1, (df: DataFrame) => df.limit(0), "programmatic")
    ct2.registerClassIfAbsent("prog", "graft.DoubleVTransform")
    assert(ct2.latestVersion("prog").contains(2))
    assert(ct2.transformNamed(in, "prog").count() == 1)
  }

  test("config transform loads from a JSON file") {
    val p = Files.createTempFile("graft_cfg", ".json")
    Files.writeString(p, """{"select": ["id"]}""")
    val out = ConfigTransform.fromFile(p.toString)(people)
    assert(out.columns.toSeq == Seq("id"))
  }

  test("compare_schemas reports added/removed/changed") {
    val v1 = Seq(ColumnSpec("id", LongType), ColumnSpec("name", StringType),
      ColumnSpec("age", IntegerType))
    val v2 = Seq(ColumnSpec("id", LongType), ColumnSpec("age", LongType),
      ColumnSpec("tier", StringType))
    val d = SchemaEvolution.compareSchemas(v1, v2)
    assert(d.added == Seq("tier"))
    assert(d.removed == Seq("name"))
    assert(d.changed == Seq(("age", "int", "bigint")))
  }

  test("empty input flows through config/sql/code transforms") {
    val empty = people.where(lit(false))
    val cfg = ConfigTransform.fromJson(
      """{"filter": {"age": {">": 0}}, "add_columns": {"x": "age * 2"}}""")(empty)
    assert(cfg.count() == 0 && cfg.columns.contains("x"))
    val sql = new SqlTransform(spark).transform(empty, "SELECT id FROM input_data")
    assert(sql.count() == 0)
    val code = new CodeTransform().transform(empty, df => df.select("id"))
    assert(code.count() == 0)
  }
}
