package graft

import org.apache.spark.sql.functions._

/** Stage profile of dedup_embedding_incr's plan at a given SF dir:
  * prepare/count, Lloyd train, increment assignment, self-candidate
  * volume, self verify, cross verify — each timed separately so the
  * dominant stage is measured, not guessed (r12 discipline).
  * Run with `Test/runMain graft.EmbIncrProbe <sfDir>`. */
object EmbIncrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val spark = Sessions.local(appName = "graft-embincr-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Similarity}
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"EMBPROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val ex = Similarity.prepared(all.where(col("vec_id") < 250))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val incoming = all.where(col("vec_id") >= 250)
    val union = ex.unionByName(Similarity.prepared(incoming))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = t("union count+cache")(union.count())
    val k = Similarity.autoCells(n)
    println(s"EMBPROBE n=$n k=$k")
    val centroids = t("lloyd train")(Similarity.trainIvfCentroids(union, k))
    union.unpersist(false)
    val exCells = Similarity.cellAssignments(ex, centroids, 2)

    // mirror embeddingStateStep's stages
    val inc = Similarity.prepared(incoming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("inc prepare+cache")(inc.count())
    val incCells = t("inc assignment")(
      Similarity.cellAssignments(inc, centroids, 2).localCheckpoint())
    val candSelf = t("self candidates distinct")(
      incCells.as("x").join(incCells.as("y"),
          col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
        .distinct().localCheckpoint())
    println(s"EMBPROBE self_cand_rows=${candSelf.count()}")
    val droppedSelf = t("self verify")(
      Dedup.verifyCosine(candSelf, inc, inc, 0.45)
        .select(col("b_id").as("vec_id")).distinct().localCheckpoint())
    println(s"EMBPROBE self_dropped=${droppedSelf.count()}")
    val candCross = t("cross candidates")(
      incCells.as("i").join(exCells.as("e"), col("i.cell") === col("e.cell"))
        .select(col("i.vec_id").as("a_id"), col("e.vec_id").as("b_id"))
        .distinct().localCheckpoint())
    println(s"EMBPROBE cross_cand_rows=${candCross.count()}")
    t("cross verify")(
      Dedup.verifyCosine(candCross, inc, ex, 0.45)
        .select(col("a_id")).distinct().count())
    spark.stop()
  }
}
