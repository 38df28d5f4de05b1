package graft

import org.apache.spark.sql.functions._

/** Stage decomposition of q_percentiles at a given SF (run with
  * `Test/runMain graft.PctlStageProbe <sfDir>`): the floor probe shows
  * the query reads ~4.8x its bare range-sort floor at sf10 — which of
  * the three passes carries the excess? Replicates Sketches.percentiles'
  * internals pass by pass. */
object PctlStageProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = Sessions.local(appName = "graft-pctl-stage")
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val base = li
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("__v"))
      .where(col("__v").isNotNull)
    val parts = spark.sessionState.conf.numShufflePartitions
    val nGroup = 1
    def time(tag: String)(f: => Unit): Unit = {
      val t = System.nanoTime
      f
      println(f"PCTLSTAGE $tag ${(System.nanoTime - t) / 1e9}%.1f s")
    }
    val sortedRdd = base
      .repartitionByRange(parts, col("l_returnflag"), col("__v"))
      .sortWithinPartitions(col("l_returnflag"), col("__v"))
      .rdd
    // pass 1+2: sorted + per-(partition, group) counting + collect
    time("pass2_counts") {
      sortedRdd.mapPartitionsWithIndex { (pid, it) =>
        val buf = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]()
        it.foreach { r =>
          val gk = (0 until nGroup).map(r.get)
          buf(gk) = buf.getOrElse(gk, 0L) + 1L
        }
        buf.iterator.map { case (gk, c) => (pid, gk, c) }
      }.collect()
    }
    time("pass2_counts2") {
      sortedRdd.mapPartitionsWithIndex { (pid, it) =>
        val buf = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]()
        it.foreach { r =>
          val gk = (0 until nGroup).map(r.get)
          buf(gk) = buf.getOrElse(gk, 0L) + 1L
        }
        buf.iterator.map { case (gk, c) => (pid, gk, c) }
      }.collect()
    }
    // pass 3 shape without rank logic: a streaming flatMap emitting
    // nothing, off the already-counted sortedRdd (second job, reused
    // map files + re-sort)
    time("pass3_streamonly") {
      sortedRdd.mapPartitions(it => it.flatMap(_ => Nil: Seq[Int])).count()
    }
    // the full query for reference
    time("query_full") {
      graft.operators.Sketches.percentiles(li, "l_extendedprice", Seq("l_returnflag"))
        .write.format("noop").mode("overwrite").save()
    }
    // same, second run
    time("query_full2") {
      graft.operators.Sketches.percentiles(li, "l_extendedprice", Seq("l_returnflag"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
