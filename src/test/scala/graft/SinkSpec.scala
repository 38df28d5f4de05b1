package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.sinks.{BatchWriter, Compaction, JdbcWriter}

/** JDBC write-back strategies against embedded Derby (reference
  * batch_writer.py targets a database) and small-file compaction. */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir = Files.createTempDirectory("graft_derby_w").toString + "/db"
  private lazy val url = s"jdbc:derby:$dbDir;create=true"

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
  ).toDF("k", "name", "v")

  private def readBack(table: String) =
    spark.read.jdbc(url, table, new java.util.Properties())
      .orderBy("k").as[(Long, String, Double)].collect().toSeq

  test("jdbc INSERT creates; APPEND adds; REPLACE truncate-loads") {
    JdbcWriter.write(base, url, "t1", BatchWriter.Insert)
    assert(readBack("t1") == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    intercept[Exception] { JdbcWriter.write(base, url, "t1", BatchWriter.Insert) }
    JdbcWriter.write(base, url, "t1", BatchWriter.Append)
    assert(readBack("t1").length == 6)
    JdbcWriter.write(base, url, "t1", BatchWriter.Replace)
    assert(readBack("t1").length == 3)
  }

  test("jdbc UPSERT merges via staging table + one MERGE transaction") {
    JdbcWriter.write(base, url, "t2", BatchWriter.Insert)
    val delta = Seq((2L, "b2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    JdbcWriter.write(delta, url, "t2", BatchWriter.Upsert(Seq("k")))
    assert(readBack("t2") ==
      Seq((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // staging table cleaned up
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "T2_GRAFT_STAGING", null)
      assert(!rs.next(), "staging table should be dropped after merge")
    } finally conn.close()
  }

  test("pipeline spec runs database-to-database: jdbc source, transform, jdbc sink") {
    // seed a source table; VARCHAR DDL because Derby maps Spark's
    // StringType to CLOB, which rejects pushed equality predicates
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE pipe_src (id BIGINT, status VARCHAR(8), amount DOUBLE)")
      st.execute("INSERT INTO pipe_src VALUES (1, 'O', 10.0), (2, 'O', 20.0), (3, 'F', 30.0), (4, 'O', 5.0)")
      st.close()
    } finally conn.close()
    val spec =
      s"""{
         | "ingestion": {"url": "$url", "table": "pipe_src",
         |   "probe_sql": "VALUES 1",
         |   "partition_column": "id", "num_partitions": 2,
         |   "predicate": "status = 'O'"},
         | "transformation": [{"type": "config", "config":
         |   {"aggregations": {"group_by": ["status"],
         |    "aggregate": {"total": "SUM(amount)", "n": "COUNT(*)"}}}}],
         | "persistence": {"url": "$url", "table": "pipe_out", "strategy": "replace"}
         |}""".stripMargin
    val ledgerDir = Files.createTempDirectory("graft_pipeconn").toString
    val rl = new graft.pipeline.RunLedger(ledgerDir)
    val r = graft.pipeline.Pipeline.runJson(spark, spec, runLedger = Some(rl))
    assert(r.writeStats.exists(_.rowsWritten == 1))
    // the JDBC source probe left a durable connection-stats row
    // (reference get_pool_status): healthy, 2 planned connections
    // (= num_partitions), latency recorded
    val conns = rl.runs(spark).where("stage = 'connection'").collect()
    assert(conns.length == 1)
    assert(conns(0).getAs[String]("strategy").startsWith("ok=true;attempts=1"))
    assert(conns(0).getAs[Long]("rows") == 2L)
    // aggregate naming: {col}_{func} for column aggs, config key for COUNT(*)
    val out = spark.read.jdbc(url, "pipe_out", new java.util.Properties())
      .selectExpr("amount_sum", "n").collect()
    assert(out.length == 1)
    assert(out(0).getDouble(0) == 35.0 && out(0).getLong(1) == 3L)
  }

  test("compaction merges small files; data identical; sort clusters ranges") {
    val p = Files.createTempDirectory("graft_compact").toString + "/tbl"
    // 20 tiny appends -> >= 20 small files
    (1 to 20).foreach { i =>
      Seq((i.toLong, s"row_$i")).toDF("id", "s")
        .coalesce(1).write.mode("append").parquet(p)
    }
    val before = spark.read.parquet(p).orderBy("id").collect().toSeq
    val stats = Compaction.compact(spark, p,
      targetFileBytes = 1L << 30, sortCols = Seq("id"))
    assert(stats.filesBefore >= 20 && stats.filesAfter == 1,
      s"expected 20+ -> 1 files, got $stats")
    val after = spark.read.parquet(p).orderBy("id").collect().toSeq
    assert(after == before)
  }
}
