package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Incremental maintenance of a stored IVF-PQ index: extension encodes
  * must be bit-compatible with build encodes, extended vectors must be
  * searchable, and increment replay must be idempotent. */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_idx_$tag").toString

  test("extension encoder is bit-identical to the build encoder under the same model") {
    // extend an index with vectors it ALREADY contains: the increment
    // codes must exactly reproduce the build's codes rows — same cell
    // assignment, same PQ codes, same norm — because the frozen model
    // fully determines the encoding
    val dir = tmp("enc")
    Similarity.buildIvfPqIndex(emb, dir)
    Similarity.extendIvfPqIndex(emb, col("vec_id") % 10 === 0, dir, 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("centroid_id"), col("codes"), col("norm"))
        .as[(Long, Int, Seq[Int], Double)].collect().sortBy(_._1).toSeq
    val base = rows(spark.read.parquet(s"$dir/codes")
      .where(col("vec_id") % 10 === 0))
    val inc = rows(spark.read.parquet(s"$dir/codes_inc"))
    assert(inc.nonEmpty && inc == base)
  }

  test("extended index searches the increment: full-probe search == brute force over the union") {
    // base = %10!=0 split, increment = %10==0 appended WITHOUT retrain.
    // With every cell probed and a refine budget covering the corpus,
    // the PQ approximation only ORDERS candidates — the exact re-rank
    // makes the result equal to brute force, so equality here proves
    // the increment rows flow through search exactly like build rows.
    val dir = tmp("probe")
    Similarity.buildIvfPqIndex(emb.where(col("vec_id") % 10 =!= 0), dir)
    Similarity.extendIvfPqIndex(emb, col("vec_id") % 10 === 0, dir, 1L)
    val viaIndex = Similarity.searchIvfPqIndex(emb, col("vec_id") < 10, dir,
        k = 10, nprobe = 16, refine = 100)
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().toSeq.sorted
    val brute = Similarity.knnBrute(emb, col("vec_id") < 10, k = 10)
      .select("q_id", "n_id", "rank").as[(Long, Long, Long)].collect().toSeq.sorted
    assert(viaIndex == brute)
    // and the increment really participates: some neighbour is %10==0
    assert(viaIndex.exists { case (_, n, _) => n % 10 == 0 })
  }

  test("increment replay is idempotent: same __increment_id overwrites, never doubles") {
    val dir = tmp("replay")
    Similarity.buildIvfPqIndex(emb.where(col("vec_id") % 10 =!= 0), dir)
    Similarity.extendIvfPqIndex(emb, col("vec_id") % 10 === 0, dir, 1L)
    val once = spark.read.parquet(s"$dir/codes_inc").count()
    Similarity.extendIvfPqIndex(emb, col("vec_id") % 10 === 0, dir, 1L)
    assert(spark.read.parquet(s"$dir/codes_inc").count() == once)
    // a SECOND increment lands beside the first
    Similarity.extendIvfPqIndex(emb, col("vec_id") === 3, dir, 2L)
    assert(spark.read.parquet(s"$dir/codes_inc").count() == once + 1)
  }
}
