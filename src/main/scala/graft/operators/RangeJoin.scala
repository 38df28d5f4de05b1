package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval (range) join: match left rows whose timestamp falls
  * inside a right-side [start, end] interval with the same key.
  *
  * Spark plans a raw `l.ts BETWEEN r.start AND r.end` predicate as a
  * nested-loop join — per-key quadratic, a non-starter at 100 TB. Banding
  * makes it an equi-join: every interval explodes to the time bands it
  * covers, every left row computes its single band, the join runs on
  * (key, band) hash-partitioned, and the exact BETWEEN filter runs only
  * on band-collocated candidates. Row amplification is bounded by
  * interval_length / band width, so pick `bandSeconds` near the typical
  * interval length. */
object RangeJoin {

  def bandedIntervalJoin(left: DataFrame, leftTs: String,
                         right: DataFrame, startCol: String, endCol: String,
                         key: String, bandSeconds: Long = 3600): DataFrame = {
    val bandUs = bandSeconds * 1000000L
    // cast-to-LTZ first so NTZ event times band too (session TZ is pinned
    // to UTC, so the cast is value-preserving and deterministic)
    def bandOf(c: Column): Column = floor(unix_micros(c.cast("timestamp")) / bandUs)
    val l = left.withColumn("__band", bandOf(col(leftTs)))
    val r = right.withColumn("__band",
      explode(sequence(bandOf(col(startCol)), bandOf(col(endCol)))))
    l.join(r, Seq(key, "__band"))
      .where(col(leftTs) >= col(startCol) && col(leftTs) <= col(endCol))
      .drop("__band")
  }
}
