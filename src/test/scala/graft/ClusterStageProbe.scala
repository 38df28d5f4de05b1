package graft

import org.apache.spark.sql.functions._

/** Stage profile of the closure tier (dedup_clusters pipeline) at a
  * given SF: shingle pass, banding, dispatch estimate, star verify,
  * residual verify, connected components — measured separately so the
  * next optimisation targets the dominant stage, not a guess.
  * Run with `Test/runMain graft.ClusterStageProbe <sfDir>`. */
object ClusterStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val spark = Sessions.local(appName = "graft-cluster-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CLPROBE $tag%-26s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val sets = Dedup.shingleHashSets(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("shingle pass (cache fill)")(sets.count())
    val buckets = t("banding -> checkpoint")(
      Dedup.bandBuckets(sets, 128, 32).localCheckpoint())
    val est = t("dispatch estimate")(
      buckets.groupBy("bucket").agg(count(lit(1)).as("g"))
        .agg(coalesce(sum((col("g") * (col("g") - 1) / 2).cast("long")),
          lit(0L))).head().getLong(0))
    println(s"CLPROBE est_full_pairs=$est")
    val verified = t("spanning star+residual")(
      Dedup.spanningVerifiedPairs(buckets, sets, 0.8).localCheckpoint())
    println(s"CLPROBE verified_pairs=${verified.count()} " +
      s"stats=${Dedup.lastSpanningStats}")
    val cc = t("connected components")(
      Dedup.connectedComponents(verified, docs).localCheckpoint())
    println(s"CLPROBE clusters_rows=${cc.count()} rounds=${Dedup.lastCcRounds}")
    sets.unpersist(false)
    spark.stop()
  }
}
