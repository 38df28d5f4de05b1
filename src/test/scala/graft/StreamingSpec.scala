package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streaming-mode execution of the SURVEY §2.5 transforms: the windowed
  * aggregation under a real watermark on a MemoryStream, and the
  * flatMapGroupsWithState sessionizer's gap-close path. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedAgg over a MemoryStream with watermark matches batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowedAgg(df, watermark = true)
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      mem.addData((ts(5), "click", 1.0), (ts(15), "click", 2.0), (ts(5), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val hour = Timestamp.valueOf("2024-01-01 10:00:00")
      assert(rows == Set((hour, "click", 2L, 3.0), (hour, "view", 1L, 5.0)))
      // batch plan over the same rows agrees (stream/batch unification)
      val batch = EventStream.windowedAgg(
        Seq((ts(5), "click", 1.0), (ts(15), "click", 2.0), (ts(5), "view", 5.0))
          .toDF("ts", "event_type", "value"))
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(batch == rows)
    } finally q.stop()
  }

  test("stateful sessionizer closes a session when the gap passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeStream(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then an event 40 min
      // later -> the arrival closes session 1 via the gap check
      mem.addData(EventStream.Event(1L, ts(0), 100L), EventStream.Event(1L, ts(5), 101L))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open
      mem.addData(EventStream.Event(1L, ts(45), 102L))
      q.processAllAvailable()
      val closed = spark.table("sessions")
        .as[EventStream.Session].collect().toSeq
      assert(closed.map(s => (s.user_id, s.session_start, s.session_end, s.n_events)) ==
        Seq((1L, ts(0), ts(5), 2L)))
    } finally q.stop()
  }

  test("stateful sessionizer closes idle sessions via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeStream(mem.toDS(), gapMinutes = 30, lateness = "5 minutes")
      .writeStream.format("memory").queryName("sessions_timeout")
      .outputMode("append").start()
    try {
      mem.addData(EventStream.Event(1L, ts(0), 1L))
      q.processAllAvailable()
      // another user's much-later events push the watermark past
      // user 1's last+gap -> user 1's session must close by timeout
      mem.addData(EventStream.Event(2L, Timestamp.valueOf("2024-01-01 12:00:00"), 2L))
      q.processAllAvailable()
      mem.addData(EventStream.Event(2L, Timestamp.valueOf("2024-01-01 12:01:00"), 3L))
      q.processAllAvailable()
      val closed = spark.table("sessions_timeout")
        .as[EventStream.Session].collect().toSeq
        .filter(_.user_id == 1L)
      assert(closed.map(s => (s.session_start, s.session_end, s.n_events)) ==
        Seq((ts(0), ts(0), 1L)))
    } finally q.stop()
  }

  test("batch sessionize splits on gap and counts events") {
    val events = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(50), 3L),
      (2L, ts(0), 4L)).toDF("user_id", "ts", "event_id")
    val out = EventStream.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
}
