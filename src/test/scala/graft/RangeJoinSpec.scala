package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-05-01 $h%02d:$m%02d:00")

  test("banded interval join equals the naive range join, without a nested loop") {
    val points = Seq(
      (1L, 7L, ts(9, 30)), (2L, 7L, ts(11, 15)), (3L, 7L, ts(23, 0)),
      (4L, 8L, ts(9, 30))).toDF("pid", "k", "t")
    val intervals = Seq(
      (7L, 100L, ts(9, 0), ts(10, 0)),   // spans two hourly bands
      (7L, 101L, ts(11, 0), ts(12, 30)),
      (8L, 102L, ts(20, 0), ts(21, 0))).toDF("k", "iid", "s", "e")
    val banded = RangeJoin.bandedIntervalJoin(points, "t", intervals, "s", "e", "k")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, points("k") === intervals("k") &&
        points("t") >= intervals("s") && points("t") <= intervals("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(banded == naive)
    assert(banded == Set((1L, 100L), (2L, 101L)))
    // scale shape: the banded plan joins hash-to-hash, never nested-loop
    val plan = RangeJoin.bandedIntervalJoin(points, "t", intervals, "s", "e", "k")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }
}
