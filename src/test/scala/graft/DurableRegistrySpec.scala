package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.operators.{SchemaRegistry, SqlTransform}
import graft.operators.SchemaEvolution.ColumnSpec
import graft.pipeline.{DurableRegistry, Pipeline, RunLedger}

/** Durable registries + run ledger: state registered in one "session"
  * (registry instance) must load in a fresh one, mirroring the
  * reference's DB-backed schema/query registries
  * (schema_validator.py:259/:347/:446, sql_transformer.py:218) and
  * per-run stage stats (workers/tasks.py:354). */
class DurableRegistrySpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("durable registry: versions round-trip, immutable, history ordered") {
    val dir = tmp("graft_reg")
    val r1 = new DurableRegistry(dir)
    r1.put("orders_clean", 1, "SELECT 1", "initial")
    r1.put("orders_clean", 2, "SELECT 2", "add filter")
    r1.put("other", 1, "SELECT 9")
    // immutable versions: re-registering v1 is an error, not a silent overwrite
    intercept[IllegalStateException] { r1.put("orders_clean", 1, "SELECT 1b") }

    // fresh instance = fresh session reading the same shared storage
    val r2 = new DurableRegistry(dir)
    assert(r2.get("orders_clean", 1).contains("SELECT 1"))
    assert(r2.latest("orders_clean").contains("SELECT 2"))
    assert(r2.latestVersion("orders_clean").contains(2))
    assert(r2.history("orders_clean") == Seq((1, "initial"), (2, "add filter")))
    assert(r2.names() == Seq("orders_clean", "other"))
    assert(r2.get("orders_clean", 3).isEmpty && r2.latest("missing").isEmpty)
  }

  test("schema registry with backing: register -> new session -> load + history") {
    val dir = tmp("graft_schreg")
    val v1 = Seq(ColumnSpec("id", IntegerType, nullable = false),
      ColumnSpec("name", StringType, default = Some("unknown")))
    val v2 = v1 :+ ColumnSpec("score", IntegerType, default = Some(0))
    val reg1 = new SchemaRegistry(Some(dir))
    reg1.register("users", 1, v1, "initial")
    reg1.register("users", 2, v2, "add score")

    val reg2 = new SchemaRegistry(Some(dir)) // fresh session
    assert(reg2.get("users", 1).contains(v1))
    assert(reg2.latestVersion("users").contains(2))
    assert(reg2.latest("users").contains(v2))
    assert(reg2.history("users") == Seq((1, "initial"), (2, "add score")))
    // defaults survive the JSON round-trip with usable primitive types
    val loaded = reg2.get("users", 2).get
    assert(loaded.find(_.name == "score").get.default.contains(0L))
    assert(loaded.find(_.name == "name").get.default.contains("unknown"))
  }

  test("sql transform with backing: query versions load in a fresh session") {
    val dir = tmp("graft_sqlreg")
    val t1 = new SqlTransform(spark, Some(dir))
    t1.registerQueryVersion("daily_rollup", 1,
      "SELECT o_orderpriority, COUNT(*) n FROM input_data GROUP BY 1", "v1")
    t1.registerQueryVersion("daily_rollup", 2,
      "SELECT o_orderpriority, COUNT(*) n FROM input_data GROUP BY 1 ORDER BY 1", "sorted")

    val t2 = new SqlTransform(spark, Some(dir)) // fresh session
    assert(t2.latestVersion("daily_rollup").contains(2))
    assert(t2.transformationHistory("daily_rollup") == Seq((1, "v1"), (2, "sorted")))
    val orders = graft.sources.Ingestor.table(spark, sf(), "orders")
    val out = t2.transform(orders, t2.getQuery("daily_rollup", 2).get)
    assert(out.count() == 5)
  }

  test("run ledger: pipeline run appends per-stage rows; ledger is queryable") {
    val ledgerDir = tmp("graft_runledger") + "/ledger"
    val out = tmp("graft_runout") + "/out"
    val rl = new RunLedger(ledgerDir)
    val spec =
      s"""{
         | "ingestion": {"path": "${sf()}/orders.parquet",
         |   "predicate": "o_orderstatus = 'O'"},
         | "transformation": [{"type": "config", "config":
         |   {"aggregations": {"group_by": ["o_orderpriority"],
         |    "aggregate": {"n": "COUNT(*)"}}}}],
         | "persistence": {"path": "$out", "strategy": "replace"}
         |}""".stripMargin
    Pipeline.runJson(spark, spec, runLedger = Some(rl), pipelineName = "daily")
    Pipeline.runJson(spark, spec, runLedger = Some(rl), pipelineName = "daily")

    val rows = rl.forPipeline(spark, "daily").collect()
    // 2 runs x (ingestion, transformation, persistence, write)
    assert(rows.length == 8)
    val stages = rows.map(_.getAs[String]("stage")).toSet
    assert(stages == Set("ingestion", "transformation", "persistence", "write"))
    val writes = rows.filter(_.getAs[String]("stage") == "write")
    assert(writes.forall(_.getAs[Long]("rows") == 5L))
    assert(writes.forall(_.getAs[String]("strategy") == "Replace"))
    // distinct run ids: the ledger distinguishes runs, not just pipelines
    assert(rows.map(_.getAs[String]("run_id")).toSet.size == 2)
  }

  test("pipeline fail-fast: dead source path fails before any job is scheduled") {
    val spec =
      s"""{"ingestion": {"path": "/root/testdata/sf0.001/nope.parquet"}}"""
    val e = intercept[IllegalStateException] {
      Pipeline.runJson(spark, spec)
    }
    assert(e.getMessage.contains("health check failed"))
  }
}
