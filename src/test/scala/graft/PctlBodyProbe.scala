package graft

import org.apache.spark.sql.functions._

/** Per-row-body A/B for q_percentiles' counting pass (run with
  * `Test/runMain graft.PctlBodyProbe <sfDir>`): the pass costs 36-40 s
  * at sf10 where a body-free stream over the same sorted RDD costs
  * 4.4 s. Which part of the body: the Seq[Any] key allocation, the
  * LinkedHashMap hashing, or the Row accessor? */
object PctlBodyProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = Sessions.local(appName = "graft-pctl-body")
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val base = li
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("__v"))
      .where(col("__v").isNotNull)
    val parts = spark.sessionState.conf.numShufflePartitions
    def sortedRdd() = base
      .repartitionByRange(parts, col("l_returnflag"), col("__v"))
      .sortWithinPartitions(col("l_returnflag"), col("__v"))
      .rdd
    def time(tag: String)(f: => Unit): Unit = {
      val t = System.nanoTime
      f
      println(f"PCTLBODY $tag ${(System.nanoTime - t) / 1e9}%.1f s")
    }
    // baseline: stream only, touch nothing
    time("stream_only")(sortedRdd().mapPartitions(it =>
      Iterator.single(it.size)).collect())
    // touch the group column only
    time("get_only")(sortedRdd().mapPartitions { it =>
      var n = 0L
      it.foreach(r => if (r.get(0) != null) n += 1)
      Iterator.single(n)
    }.collect())
    // current body: Seq[Any] key + LinkedHashMap
    time("seq_linkedmap")(sortedRdd().mapPartitionsWithIndex { (pid, it) =>
      val buf = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]()
      it.foreach { r =>
        val gk = (0 until 1).map(r.get)
        buf(gk) = buf.getOrElse(gk, 0L) + 1L
      }
      buf.iterator.map { case (gk, c) => (pid, gk, c) }
    }.collect())
    // run-length body: the partitions are SORTED by group, so groups
    // are contiguous — compare to the previous key, no map at all
    time("runlength")(sortedRdd().mapPartitionsWithIndex { (pid, it) =>
      val out = scala.collection.mutable.ArrayBuffer[(Int, Any, Long)]()
      var cur: Any = null
      var n = 0L
      var any = false
      it.foreach { r =>
        val k = r.get(0)
        if (!any) { cur = k; any = true }
        else if (k != cur) { out += ((pid, cur, n)); cur = k; n = 0L }
        n += 1L
      }
      if (any) out += ((pid, cur, n))
      out.iterator
    }.collect())
    spark.stop()
  }
}
