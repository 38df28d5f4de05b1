package graft

import org.apache.spark.sql.functions._
import graft.sources.Ingestor

class IngestorSpec extends SparkSpec {

  test("table loader reads every standard table; events gets µs timestamps") {
    Ingestor.tableNames.foreach { n =>
      val df = Ingestor.table(spark, sf(), n)
      assert(df.count() > 0, s"$n empty")
    }
    // NTZ (naive) end-to-end so derived timestamps round-trip through
    // parquet the same way every other engine reads these files
    val events = Ingestor.table(spark, sf(), "events")
    assert(events.schema("ts").dataType.typeName == "timestamp_ntz")
  }

  test("csv and json sources read through the same API with schema + pushdown predicate") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    spark.read.parquet(s"${sf()}/region.parquet")
      .write.option("header", "true").csv(s"$dir/csv")
    spark.read.parquet(s"${sf()}/region.parquet").write.json(s"$dir/json")
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType)))
    val csv = Ingestor.read(spark, s"$dir/csv", format = "csv",
      schema = Some(schema), options = Map("header" -> "true"),
      columns = Seq("r_name"), predicate = Some(col("r_regionkey") > 2))
    assert(csv.as[String].collect().toSet == Set("EUROPE", "MIDDLE EAST"))
    val json = Ingestor.read(spark, s"$dir/json", format = "json",
      schema = Some(schema), predicate = Some(col("r_name").startsWith("A")))
    assert(json.count() == 3) // AFRICA, AMERICA, ASIA
    // ORC: columnar alternative with the same pushdown behavior
    spark.read.parquet(s"${sf()}/region.parquet").write.orc(s"$dir/orc")
    val orc = Ingestor.read(spark, s"$dir/orc", format = "orc",
      columns = Seq("r_name"), predicate = Some(col("r_regionkey") > 2))
    assert(orc.as[String].collect().toSet == Set("EUROPE", "MIDDLE EAST"))
    val scan = orc.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan"),
      s"orc pushdown missing:\n$scan")
  }

  test("readChunked controls split size and optional key bucketing") {
    val df = Ingestor.readChunked(spark, s"${sf()}/orders.parquet",
      maxPartitionBytes = 1024 * 1024,
      bucketBy = Some((col("o_custkey"), 6)))
    assert(df.rdd.getNumPartitions == 6)
    assert(df.count() == 1500)
    // same key lands in the same partition (co-location contract)
    val parts = df.select(col("o_custkey"), spark_partition_id().as("p"))
      .groupBy("o_custkey").agg(countDistinct(col("p")).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(parts == 1L)
  }
}
