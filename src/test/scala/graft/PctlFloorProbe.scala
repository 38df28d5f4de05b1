package graft

import org.apache.spark.sql.functions._

/** The q_percentiles "range-shuffle floor" certificate at any SF (run
  * with `Test/runMain graft.PctlFloorProbe <sfDir>`): the floor claim
  * (SURVEY §2.1) — the query's cost is dominated by the unavoidable
  * repartitionByRange + sortWithinPartitions over the value relation —
  * was only ever measured at sf0.1. This measures, in one session:
  * (1) the bare range-partitioned sort over the SAME relation (one
  * pass), (2) the same sort executed TWICE off one RDD (the query's
  * two-pass shape: count pass + extract pass reusing the range
  * shuffle's map files), (3) the full query. floor2x / query is the
  * certified ratio. */
object PctlFloorProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = Sessions.local(appName = "graft-pctl-floor")
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val base = li
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("__v"))
      .where(col("__v").isNotNull)
    val parts = spark.sessionState.conf.numShufflePartitions
    def floorRdd() = base
      .repartitionByRange(parts, col("l_returnflag"), col("__v"))
      .sortWithinPartitions(col("l_returnflag"), col("__v"))
      .rdd
    def time(tag: String)(f: => Unit): Unit = {
      val t = System.nanoTime
      f
      println(f"PCTLFLOOR $tag ${(System.nanoTime - t) / 1e9}%.1f s")
    }
    // (1) one bare sorted pass (count forces the sort, row-stream only)
    time("floor_1pass")(floorRdd().count())
    time("floor_1pass2")(floorRdd().count())
    // (2) the query's shape: two passes off ONE RDD object (map files
    // reused, reduce-side sort re-executed)
    time("floor_2pass") {
      val r = floorRdd()
      r.count(); r.count()
    }
    time("floor_2pass2") {
      val r = floorRdd()
      r.count(); r.count()
    }
    // (3) the full query
    import graft.operators.Sketches
    time("query_full")(
      Sketches.percentiles(li, "l_extendedprice", Seq("l_returnflag"))
        .write.format("noop").mode("overwrite").save())
    time("query_full2")(
      Sketches.percentiles(li, "l_extendedprice", Seq("l_returnflag"))
        .write.format("noop").mode("overwrite").save())
    println("PCTLFLOOR rows=" + base.count())
    spark.stop()
  }
}
