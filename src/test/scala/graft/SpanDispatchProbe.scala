package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-session A/B of spanningVerifiedPairs' materialisation shapes
  * on the dedup_clusters pipeline: (a) r12 = localCheckpoint, no
  * dispatch estimate; (b) r13 = columnar persist + estimate; (c) r14 =
  * localCheckpoint + estimate. Cross-round artifact deltas are
  * host-contaminated; this probe decides on one box in one JVM.
  * Run with `Test/runMain graft.SpanDispatchProbe <sfDir>`. */
object SpanDispatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf1"
    val spark = Sessions.local(appName = "graft-span-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def clusters(pairsOf: (DataFrame, DataFrame) => DataFrame): Long = {
      val sets = Dedup.shingleHashSets(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val buckets = Dedup.bandBuckets(sets, 128, 32)
      val verified = pairsOf(buckets, sets)
      val out = Dedup.connectedComponents(verified, docs).count()
      sets.unpersist(false)
      out
    }

    // faithful inline copy of the r12 body: localCheckpoint, NO
    // dispatch estimate, straight to star/residual
    def r12Shape(buckets: DataFrame, sets: DataFrame): DataFrame = {
      val b = buckets.localCheckpoint()
      val hubs = b.groupBy("bucket").agg(min("id").as("hub"))
      val star = b.join(hubs, "bucket").where(col("id") =!= col("hub"))
      val starPairs = star.select(col("hub").as("a_id"), col("id").as("b_id"))
        .distinct().localCheckpoint()
      val starVerified = Dedup.jaccardVerify(starPairs, sets, 0.8)
        .localCheckpoint()
      val okPairs = starVerified.select(col("a_id").as("hub"), col("b_id").as("id"))
      val residual = star.join(okPairs, Seq("hub", "id"), "left_anti")
        .select("bucket", "id")
      val resCand = residual.as("r")
        .join(b.as("m"),
          col("r.bucket") === col("m.bucket") && col("r.id") =!= col("m.id"))
        .select(least(col("r.id"), col("m.id")).as("a_id"),
          greatest(col("r.id"), col("m.id")).as("b_id"))
        .distinct()
        .join(starPairs, Seq("a_id", "b_id"), "left_anti")
        .localCheckpoint()
      val resVerified = Dedup.jaccardVerify(resCand, sets, 0.8)
        .localCheckpoint()
      starVerified.unionByName(resVerified)
    }
    def r14Shape(buckets: DataFrame, sets: DataFrame): DataFrame =
      Dedup.spanningVerifiedPairs(buckets, sets, 0.8)
    def r13Shape(buckets: DataFrame, sets: DataFrame): DataFrame = {
      val b = buckets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = Dedup.spanningVerifiedPairs(b, sets, 0.8).localCheckpoint()
      b.unpersist(false)
      out
    }

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SPANPROBE $tag%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    // interleave 2 rounds so JIT/host drift doesn't favour a shape
    for (round <- 1 to 2) {
      t(s"r12_$round")(clusters(r12Shape))
      t(s"r13_$round")(clusters(r13Shape))
      t(s"r14_$round")(clusters(r14Shape))
    }
    spark.stop()
  }
}
