package graft

import org.apache.spark.sql.functions._

/** Stage split of dedup_neardup_probe/incr at a given SF (r19 verdict
  * item 5): increment shingle pass, banding, the witness-bounded cross
  * feed, the spanning self feed, and the report tail — measured
  * separately so §2.3 narrowing targets the real cost. Run with
  * `Test/runMain graft.NeardupStageProbe <sfDir>`. */
object NeardupStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val spark = Sessions.local(appName = "graft-neardup-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val existing = all.where(col("doc_id") < 250)
    val incoming = all.where(col("doc_id") >= 250)

    def t[T](tag: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"NDPROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val setsEx = Dedup.shingleHashSets(existing)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("existing shingle (250 docs)")(setsEx.count())
    val bEx = Dedup.bandBuckets(setsEx, 128, 32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("existing banding")(bEx.count())

    val setsIn = Dedup.shingleHashSets(incoming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("incoming shingle pass")(setsIn.count())
    val bIn = t("incoming banding -> ckpt")(
      Dedup.bandBuckets(setsIn, 128, 32).localCheckpoint())
    println(s"NDPROBE bucket_rows=${bIn.count()}")
    val selfPairs = t("self spanning feed+verify")(
      Dedup.spanningVerifiedPairs(bIn, setsIn, 0.8).localCheckpoint())
    println(s"NDPROBE self_verified=${selfPairs.count()} " +
      s"stats=${Dedup.lastSpanningStats}")
    t("full nearDupIncrement e2e")(
      Dedup.nearDupIncrement(existing, incoming, 0.8)
        .select("doc_id", "source").orderBy("doc_id")
        .write.format("noop").mode("overwrite").save())
    setsEx.unpersist(false); bEx.unpersist(false); setsIn.unpersist(false)
    spark.stop()
  }
}
