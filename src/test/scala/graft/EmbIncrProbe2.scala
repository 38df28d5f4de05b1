package graft

import org.apache.spark.sql.functions._

/** Follow-up probe: would a hub-first EXISTENTIAL self feed pay on the
  * sf10 increment? Measures star-edge verify rate, the residual volume
  * after excluding already-dropped members, and the fallback candidate
  * count — the numbers that decide the design before any code moves.
  * Run with `Test/runMain graft.EmbIncrProbe2 <sfDir>`. */
object EmbIncrProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val spark = Sessions.local(appName = "graft-embincr-probe2")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Similarity}
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"EMBPROBE2 $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val ex = Similarity.prepared(all.where(col("vec_id") < 250))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val incoming = all.where(col("vec_id") >= 250)
    val union = ex.unionByName(Similarity.prepared(incoming))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = union.count()
    val k = Similarity.autoCells(n)
    val centroids = t("lloyd train")(Similarity.trainIvfCentroids(union, k))
    union.unpersist(false)
    val inc = Similarity.prepared(incoming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    inc.count()
    val incCells = t("inc assignment")(
      Similarity.cellAssignments(inc, centroids, 2).localCheckpoint())

    val hubs = incCells.groupBy("cell").agg(min("vec_id").as("hub"))
    val star = incCells.join(hubs, "cell").where(col("vec_id") =!= col("hub"))
      .localCheckpoint()
    val starEdges = t("star edges distinct")(
      star.select(col("hub").as("a_id"), col("vec_id").as("b_id"))
        .distinct().localCheckpoint())
    println(s"EMBPROBE2 star_edges=${starEdges.count()}")
    val starVerified = t("star verify")(
      Dedup.verifyCosine(starEdges, inc, inc, 0.45)
        .select("a_id", "b_id").localCheckpoint())
    println(s"EMBPROBE2 star_verified=${starVerified.count()}")
    val droppedByHub = starVerified.select(col("b_id").as("vec_id")).distinct()
      .localCheckpoint()
    println(s"EMBPROBE2 dropped_by_hub=${droppedByHub.count()}")
    val ok = starVerified.select(col("a_id").as("hub"), col("b_id").as("vec_id"))
    val residual = t("residual")(
      star.join(ok, Seq("hub", "vec_id"), "left_anti")
        .join(droppedByHub, Seq("vec_id"), "left_anti")
        .select("cell", "vec_id").localCheckpoint())
    println(s"EMBPROBE2 residual_rows=${residual.count()}")
    val resCand = t("residual candidates")(
      residual.as("r").join(incCells.as("m"),
          col("r.cell") === col("m.cell") &&
            col("m.vec_id") < col("r.vec_id"))
        .select(col("m.vec_id").as("a_id"), col("r.vec_id").as("b_id"))
        .distinct().localCheckpoint())
    println(s"EMBPROBE2 res_cand=${resCand.count()}")
    val droppedRes = t("residual verify")(
      Dedup.verifyCosine(resCand, inc, inc, 0.45)
        .select(col("b_id").as("vec_id")).distinct().localCheckpoint())
    println(s"EMBPROBE2 dropped_by_res=${droppedRes.count()}")
    val total = droppedByHub.unionByName(droppedRes).distinct().count()
    println(s"EMBPROBE2 dropped_total=$total (truth 197862)")
    spark.stop()
  }
}
