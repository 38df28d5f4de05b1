package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.expr
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-05-01 10:$m%02d:00")

  test("as-of join picks the latest right row at-or-before each left row") {
    val trades = Seq(
      (1L, "A", ts(5)), (2L, "A", ts(20)), (3L, "A", ts(2)),
      (4L, "B", ts(10))).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts(0), 100.0), ("A", ts(5), 101.0), ("A", ts(15), 102.0),
      ("B", ts(30), 50.0)).toDF("sym", "qt", "px")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt", Seq("qt", "px"))
      .orderBy("trade_id")
      .select("trade_id", "asof_px").as[(Long, Double)].collect().toSeq
    // trade 1 @10:05 -> quote @10:05 (inclusive tie); trade 2 @10:20 -> @10:15;
    // trade 3 @10:02 -> @10:00; trade 4 (B @10:10): no prior quote -> dropped
    assert(out == Seq((1L, 101.0), (2L, 102.0), (3L, 100.0)))
  }

  test("left as-of keeps unmatched rows with nulls") {
    val trades = Seq((1L, "B", ts(10))).toDF("trade_id", "sym", "t")
    val quotes = Seq(("B", ts(30), 50.0)).toDF("sym", "qt", "px")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt", Seq("px"), inner = false)
    assert(out.count() == 1)
    assert(out.head().isNullAt(out.columns.indexOf("asof_px")))
  }

  test("forward as-of picks the earliest right row at-or-after each left row") {
    val trades = Seq(
      (1L, "A", ts(5)), (2L, "A", ts(16)), (3L, "A", ts(50)),
      (4L, "B", ts(10))).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts(5), 101.0), ("A", ts(15), 102.0), ("A", ts(30), 103.0),
      ("B", ts(0), 49.0), ("B", ts(30), 50.0)).toDF("sym", "qt", "px")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt", Seq("px"),
        direction = "forward")
      .orderBy("trade_id")
      .select("trade_id", "asof_px").as[(Long, Double)].collect().toSeq
    // 1 @10:05 -> @10:05 (inclusive tie); 2 @10:16 -> @10:30;
    // 3 @10:50: nothing after -> dropped; 4 (B @10:10) -> @10:30
    assert(out == Seq((1L, 101.0), (2L, 103.0), (4L, 50.0)))
  }

  test("tolerance bounds the match gap in both directions") {
    val trades = Seq((1L, "A", ts(20)), (2L, "A", ts(40))).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", ts(15), 102.0)).toDF("sym", "qt", "px")
    // backward within 10 min: trade1 gap 5min matches; trade2 gap 25min not
    val back = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt", Seq("px"),
        tolerance = Some(expr("INTERVAL '10' MINUTE")))
      .select("trade_id").as[Long].collect().toSeq
    assert(back == Seq(1L))
    // left variant keeps the out-of-tolerance row but nulls its match
    val left = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt", Seq("px"),
        inner = false, tolerance = Some(expr("INTERVAL '10' MINUTE")))
      .orderBy("trade_id")
      .select("trade_id", "asof_px").as[(Long, Option[Double])].collect().toSeq
    assert(left == Seq((1L, Some(102.0)), (2L, None)))
  }
}
