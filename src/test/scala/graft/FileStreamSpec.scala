package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Real `readStream` coverage: the windowed aggregation running from a
  * file source (the deployment shape: events land as files, Spark tails
  * the directory), verified against the batch run of the same transform
  * on the same rows. */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("windowedAgg over a parquet file stream matches its batch run") {
    val dir = Files.createTempDirectory("graft_stream_src").toString + "/events"
    val rows = Seq(
      (Timestamp.valueOf("2024-03-01 09:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-03-01 09:55:00"), "click", 2.0),
      (Timestamp.valueOf("2024-03-01 10:05:00"), "view", 7.0))
    rows.toDF("ts", "event_type", "value").write.parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    assert(stream.isStreaming)
    val q = EventStream.windowedAgg(stream, watermark = true)
      .writeStream.format("memory").queryName("file_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_win")
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = EventStream.windowedAgg(rows.toDF("ts", "event_type", "value"))
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(got == batch && got.size == 2)
    } finally q.stop()
  }

  test("salted aggregation equals direct aggregation") {
    val skewed = spark.range(10000)
      .select(when(col("id") % 10 === 0, "hot").otherwise(concat(lit("k"), col("id") % 7)).as("k"),
        col("id").cast("double").as("v"), col("id"))
    val direct = skewed.groupBy("k").agg(sum(functions.dec(col("v"))).cast("double").as("s"))
    val salted = skewed
      .groupBy(col("k"), functions.saltKey(col("id"), 8).as("salt"))
      .agg(sum(functions.dec(col("v"))).as("partial"))
      .groupBy("k").agg(sum(col("partial")).cast("double").as("s"))
    val d = direct.orderBy("k").as[(String, Double)].collect().toSeq
    val s = salted.orderBy("k").as[(String, Double)].collect().toSeq
    assert(d == s)
  }
}
