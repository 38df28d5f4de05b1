package graft

import org.apache.spark.sql.functions._

/** Stage split of corpus_decontaminate_semantic: prepare+count, train,
  * assignments, cross kernel, report tail. Run with
  * `Test/runMain graft.DeconSemProbe <sfDir>`. */
object DeconSemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val spark = Sessions.local(appName = "graft-deconsem-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Similarity}
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = all.where(col("vec_id") % 11 =!= 0)
    val bench = all.where(col("vec_id") % 11 === 0)

    def t[T](tag: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"DSEM $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val c = Similarity.prepared(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val b = Similarity.prepared(bench)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val union = c.unionByName(b)
    val k = t("count for autoCells")(Similarity.autoCells(union.count()))
    println(s"DSEM k=$k")
    val dim = t("dim head")(c.select(size(col("v"))).head.getInt(0))
    val centroids = t("trainIvfCentroids")(
      Similarity.trainIvfCentroids(union, k, dim = dim))
    val cm = t("corpus assign -> ckpt")(
      Similarity.cellAssignments(c, centroids, 2).localCheckpoint())
    val bm = t("bench assign -> ckpt")(
      Similarity.cellAssignments(b, centroids, 2).localCheckpoint())
    println(s"DSEM cm=${cm.count()} bm=${bm.count()}")
    val verified = t("cross kernel + distinct")(
      Dedup.cellCrossVerifiedPairs(cm, bm, c, b, 0.45)
        .distinct().localCheckpoint())
    println(s"DSEM verified=${verified.count()}")
    val matches = t("groupBy count/max")(
      verified.groupBy(col("a_id").as("vec_id"))
        .agg(count(lit(1)).as("n"), max(col("cosine")).as("m"))
        .localCheckpoint())
    t("report tail")(
      corpus.select(col("vec_id")).join(matches, Seq("vec_id"), "left")
        .orderBy("vec_id")
        .write.format("noop").mode("overwrite").save())
    c.unpersist(false); b.unpersist(false)
    spark.stop()
  }
}
