package graft

import org.apache.spark.sql.functions._

/** Stage split of dedup_embedding_lsh (r19 verdict item 2): train+assign
  * vs candidate self-join+distinct vs two-sided vector join verify —
  * measured separately so the per-cell kernel targets the real cost.
  * Run with `Test/runMain graft.EmbLshStageProbe <sfDir>`. */
object EmbLshStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val spark = Sessions.local(appName = "graft-emblsh-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Similarity}

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def t[T](tag: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"EMBLSH $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val e = Similarity.prepared(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("prepare (cache fill)")(e.count())
    val cells = t("train+assign -> ckpt")(
      Similarity.cellAssignmentsCached(emb))
    println(s"EMBLSH member_rows=${cells.count()}")
    val cand = t("cell self-join+distinct")(
      cells.as("x").join(cells.as("y"),
          col("x.cell") === col("y.cell") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
        .distinct()
        .localCheckpoint())
    println(s"EMBLSH cand_pairs=${cand.count()}")
    val aSide = e.select(col("vec_id").as("a_id"), col("v").as("av"),
      col("norm").as("anorm"))
    val bSide = e.select(col("vec_id").as("b_id"), col("v").as("bv"),
      col("norm").as("bnorm"))
    val verified = t("pair-join verify")(
      cand.join(aSide, "a_id").join(bSide, "b_id")
        .select(col("a_id"), col("b_id"),
          round(graft.functions.cosineWithNorms(
            graft.functions.dotProduct(col("av"), col("bv")),
            col("anorm"), col("bnorm")), 6).as("cosine"))
        .where(col("cosine") >= 0.45)
        .localCheckpoint())
    println(s"EMBLSH verified_pairs=${verified.count()}")
    t("orderBy tail -> noop")(
      verified.orderBy("a_id", "b_id")
        .write.format("noop").mode("overwrite").save())
    e.unpersist(false)
    spark.stop()
  }
}
