package graft

import java.sql.DriverManager

import graft.sources.{Ingestor, JdbcIngestor}
import graft.sources.JdbcIngestor.RangePartitioning

/** JDBC ingestion against an embedded Derby database (ships with Spark),
  * mirroring the reference's source-DB reader
  * (batch_ingestor.py:67/:102/:323) as partitioned `spark.read.jdbc`. */
class JdbcIngestorSpec extends SparkSpec {

  private lazy val dbDir = java.nio.file.Files
    .createTempDirectory("graft_derby").toString + "/db"
  private lazy val url = s"jdbc:derby:$dbDir;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE users (id INT PRIMARY KEY, name VARCHAR(32), score DOUBLE)")
      st.close()
      val ps = conn.prepareStatement("INSERT INTO users VALUES (?, ?, ?)")
      (1 to 1000).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"user_$i"); ps.setDouble(3, i * 0.5)
        ps.addBatch()
        if (i % 200 == 0) ps.executeBatch()
      }
      ps.executeBatch()
      ps.close()
    } finally conn.close()
  }

  test("partitioned jdbc read splits the key range across N parallel slices") {
    seeded
    val df = JdbcIngestor.jdbcTable(spark, url, "users",
      Some(RangePartitioning("id", 1, 1000, 4)))
    assert(df.rdd.getNumPartitions == 4, "one task per key-range slice")
    assert(df.count() == 1000)
    // every row arrives exactly once across the disjoint slices
    import org.apache.spark.sql.functions._
    val agg = df.agg(sum("id"), countDistinct("id")).collect()(0)
    assert(agg.getLong(0) == 1000L * 1001 / 2 && agg.getLong(1) == 1000)
  }

  test("auto-partitioned read probes bounds remotely; filters push to the database") {
    seeded
    val df = JdbcIngestor.jdbcTableAutoPartitioned(spark, url, "users", "id", 4)
    assert(df.rdd.getNumPartitions == 4)
    val filtered = df.where("id <= 100").select("id", "name")
    assert(filtered.count() == 100)
    // predicate reaches the remote query, not a post-transfer filter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual"),
      s"expected jdbc pushdown in plan:\n$plan")
  }

  test("arbitrary-SQL ingestion runs remotely and stays range-partitionable") {
    seeded
    val df = JdbcIngestor.jdbcQuery(spark, url,
      "SELECT id, score FROM users WHERE score > 250;",
      Some(RangePartitioning("id", 500, 1000, 2)))
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 500) // scores 250.5 .. 500.0 -> ids 501..1000
  }

  test("describeJdbcTable reports schema + remote count without transferring rows") {
    seeded
    val (schema, n) = JdbcIngestor.describeJdbcTable(spark, url, "users")
    assert(n == 1000)
    assert(schema.fieldNames.map(_.toLowerCase).toSet == Set("id", "name", "score"))
  }

  test("health checks: jdbc probe retries then reports, file probe validates readability") {
    seeded
    assert(JdbcIngestor.healthCheck(url, probeSql = "VALUES 1", sleep = _ => ()))
    assert(!JdbcIngestor.healthCheck(s"jdbc:derby:/nonexistent/graft_nope",
      probeSql = "VALUES 1", maxRetries = 2, sleep = _ => ()))
    assert(Ingestor.healthCheck(spark, s"${sf()}/orders.parquet"))
    assert(!Ingestor.healthCheck(spark, "/root/testdata/sf0.001/nope.parquet",
      maxRetries = 2, sleep = _ => ()))
  }

  test("healthCheckReport records outcome, attempts and latency; ledger row is credential-sanitized") {
    seeded
    val ok = JdbcIngestor.healthCheckReport(url, probeSql = "VALUES 1",
      sleep = _ => ())
    assert(ok.ok && ok.attempts == 1 && ok.error.isEmpty && ok.totalMs >= 0)
    val bad = JdbcIngestor.healthCheckReport("jdbc:derby:/nonexistent/graft_nope",
      probeSql = "VALUES 1", maxRetries = 2, sleep = _ => ())
    assert(!bad.ok && bad.attempts == 2 && bad.error.nonEmpty,
      s"a failing probe reports every attempt it made: $bad")

    // durable connection-stats row through the run ledger (reference
    // get_pool_status): queryable health history, credentials stripped
    import graft.pipeline.RunLedger
    assert(RunLedger.sanitizeSource(
        "jdbc:postgresql://h/db?user=alice&password=hunter2") ==
      "jdbc:postgresql://h/db?user=***&password=***")
    assert(RunLedger.sanitizeSource("jdbc:mysql://bob:pw@host/db") ==
      "jdbc:mysql://***@host/db")
    val ledgerDir = java.nio.file.Files
      .createTempDirectory("graft_connledger").toString
    val rl = new RunLedger(ledgerDir)
    rl.recordConnection(spark, "run_1", "p1",
      url + ";user=app;password=s3cret", bad, connectionsPlanned = 4)
    val row = rl.runs(spark).where("stage = 'connection'").collect()(0)
    assert(row.getAs[Long]("rows") == 4L)
    assert(row.getAs[String]("strategy").startsWith("ok=false;attempts=2;error="))
    val src = row.getAs[String]("output_path")
    assert(!src.contains("s3cret") && src.contains("password=***"), src)
  }
}
