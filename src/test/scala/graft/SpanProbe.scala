package graft

import org.apache.spark.sql.functions._

/** Sub-stage split of [[graft.operators.Dedup.spanningVerifiedPairs]]
  * at a given SF (r19 verdict item 5, refined): hubs+star join vs
  * star-pair distinct vs star verify vs residual candidate build vs
  * residual verify — so §2.3 narrowing targets the real cost inside
  * the 34 s sf10 "spanning feed+verify" block the coarse probe found.
  * Run with `Test/runMain graft.SpanProbe <sfDir>`. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val spark = Sessions.local(appName = "graft-span-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val incoming = all.where(col("doc_id") >= 250)

    def t[T](tag: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"SPANPROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val sets = Dedup.shingleHashSets(incoming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("shingle pass (cache fill)")(sets.count())
    val b = t("banding -> ckpt")(
      Dedup.bandBuckets(sets, 128, 32).localCheckpoint())
    println(s"SPANPROBE bucket_rows=${b.count()}")

    val hubs = b.groupBy("bucket").agg(min("id").as("hub"))
    val star = b.join(hubs.hint("merge"), "bucket")
      .where(col("id") =!= col("hub"))
    t("hubs+star join (count)")(star.count())
    val starPairs = t("star distinct -> ckpt")(
      star.select(col("hub").as("a_id"), col("id").as("b_id"))
        .distinct().localCheckpoint())
    println(s"SPANPROBE star_pairs=${starPairs.count()}")
    val starVerified = t("star verify -> ckpt")(
      Dedup.jaccardVerify(starPairs, sets, 0.8).localCheckpoint())
    println(s"SPANPROBE star_verified=${starVerified.count()}")
    val okPairs = starVerified.select(col("a_id").as("hub"), col("b_id").as("id"))
    val residual = star.join(okPairs.hint("merge"), Seq("hub", "id"), "left_anti")
      .select("bucket", "id")
    val resCand = t("residual cand -> ckpt")(
      residual.as("r")
        .join(b.as("m").hint("merge"),
          col("r.bucket") === col("m.bucket") && col("r.id") =!= col("m.id"))
        .select(least(col("r.id"), col("m.id")).as("a_id"),
          greatest(col("r.id"), col("m.id")).as("b_id"))
        .distinct()
        .join(starPairs, Seq("a_id", "b_id"), "left_anti")
        .localCheckpoint())
    println(s"SPANPROBE res_cand=${resCand.count()}")
    t("residual verify (count)")(
      Dedup.jaccardVerify(resCand, sets, 0.8).count())
    sets.unpersist(false)
    spark.stop()
  }
}
