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

  private def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmRf)
    f.delete()
  }

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

  test("compaction: search bit-identical, increments folded, temps cleared") {
    val dir = tmp("cmp")
    Similarity.buildIvfPqIndex(emb.where(col("vec_id") % 10 =!= 0), dir)
    Similarity.extendIvfPqIndex(emb, col("vec_id") % 10 === 0, dir, 1L)
    def search() = Similarity.searchIvfPqIndex(emb, col("vec_id") < 10, dir, k = 10)
      .select("q_id", "n_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    val before = search()
    val nBase = spark.read.parquet(s"$dir/codes").count()
    val nInc = spark.read.parquet(s"$dir/codes_inc").count()
    Similarity.compactIvfPqIndex(spark, dir)
    assert(search() == before)
    val f = new java.io.File(dir)
    def exists(n: String) = new java.io.File(f, n).exists()
    assert(!exists("codes_inc") && !exists("codes__new") && !exists("codes__old"))
    assert(spark.read.parquet(s"$dir/codes").count() == nBase + nInc)
    // idempotent: compacting an inc-free index is a no-op
    Similarity.compactIvfPqIndex(spark, dir)
    assert(search() == before)
  }

  test("compaction recovery finishes or unwinds every crash state") {
    def fresh(): (String, Seq[(Long, Long, Long, Double)]) = {
      val dir = tmp("rec")
      Similarity.buildIvfPqIndex(emb.where(col("vec_id") % 10 =!= 0), dir)
      Similarity.extendIvfPqIndex(emb, col("vec_id") % 10 === 0, dir, 1L)
      (dir, Similarity.searchIvfPqIndex(emb, col("vec_id") < 10, dir, k = 10)
        .select("q_id", "n_id", "rank", "cos_sim")
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted)
    }
    def search(dir: String) = Similarity.searchIvfPqIndex(emb, col("vec_id") < 10, dir, k = 10)
      .select("q_id", "n_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    def mv(dir: String, a: String, b: String): Unit = {
      val ok = new java.io.File(dir, a).renameTo(new java.io.File(dir, b))
      assert(ok, s"rename $a -> $b failed")
    }
    // crash AFTER codes__new written, BEFORE codes_inc deleted: the new
    // table supersedes — recovery must finish the swap without doubling
    val (d1, exp1) = fresh()
    Similarity.loadCodes(spark, d1).repartition(col("centroid_id"))
      .write.parquet(s"$d1/codes__new")
    Similarity.recoverIvfPqCompaction(spark, d1)
    assert(search(d1) == exp1)
    assert(!new java.io.File(d1, "codes_inc").exists())
    // crash mid-swap: codes staged away, complete codes__new pending
    val (d2, exp2) = fresh()
    Similarity.loadCodes(spark, d2).repartition(col("centroid_id"))
      .write.parquet(s"$d2/codes__new")
    rmRf(new java.io.File(d2, "codes_inc"))
    mv(d2, "codes", "codes__old")
    Similarity.recoverIvfPqCompaction(spark, d2)
    assert(search(d2) == exp2)
    // crash mid-WRITE: partial codes__new (no _SUCCESS) is dropped,
    // live tables untouched
    val (d3, exp3) = fresh()
    new java.io.File(d3, "codes__new").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d3, "codes__new", "part-garbage.parquet"),
      Array[Byte](1, 2, 3))
    Similarity.recoverIvfPqCompaction(spark, d3)
    assert(!new java.io.File(d3, "codes__new").exists())
    assert(search(d3) == exp3)
    // stranded codes__old beside no codes (rename-crash without a
    // complete codes__new): restored as the base
    val (d4, exp4) = fresh()
    Similarity.compactIvfPqIndex(spark, d4)
    mv(d4, "codes", "codes__old")
    Similarity.recoverIvfPqCompaction(spark, d4)
    assert(search(d4) == exp4)
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
