package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
  * verification, embedding-cosine.
  *
  * 100 TB design rule: never materialise all pairs. Every near-dup path
  * generates candidates through a bucket join (LSH band buckets or
  * SimHash blocks) — each document lands in a handful of buckets, the
  * self-join happens per bucket, and the exact verification only runs on
  * candidates. The shuffles are all hash-partitioned on bucket keys, so
  * the work distributes evenly across executors (banding also bounds
  * bucket size: 2^64 key space, skew only if true duplicates are
  * themselves skewed, which AQE's skew-join split absorbs).
  */
object Dedup {

  /** Exact dedup by content hash: one hash-partitioned aggregation,
    * keeps the smallest id per fingerprint (deterministic winner). */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .select("keep_id", "fingerprint", "dup_count")

  /** Docs + their distinct word-3-gram shingle sets (the unit both
    * MinHash and exact Jaccard operate on). */
  def withShingles(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol), shingles(wordTokens(col(textCol)), n).as("sh"))

  /** MinHash+LSH candidate pairs: signature of `k` hashes cut into
    * `bands` bands; documents sharing any band bucket pair up. Returns
    * distinct (a_id, b_id) with a_id < b_id.
    *
    * Defaults (128 hashes, 32 bands of 4): a pair at jaccard 0.8 is
    * missed with probability (1-0.8^4)^32 ≈ 1e-7 — effectively recall-1
    * candidates for any ≥0.8 verification threshold, at the cost of more
    * low-jaccard bucket collisions (which the exact verify pass removes). */
  def minhashCandidates(docs: DataFrame, k: Int = 128, bands: Int = 32,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rows = k / bands
    val sigs = withShingles(docs, 3, idCol, textCol)
      .withColumn("base", minhashBase(col("sh")))
      .withColumn("sig", minhashSignature(col("base"), k))
      .select(col(idCol).as("id"), explode(minhashBands(col("sig"), bands, rows)).as("bucket"))
    val a = sigs.as("a")
    val b = sigs.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** Exact n-gram Jaccard verification over candidate pairs
    * ((a_id, b_id) columns): joins the shingle sets back and computes
    * |A∩B| / |A∪B|, rounded for cross-engine determinism. */
  def jaccardVerify(candidates: DataFrame, shingled: DataFrame,
                    threshold: Double): DataFrame = {
    val sa = shingled.select(col("doc_id").as("a_id"), col("sh").as("sh_a"))
    val sb = shingled.select(col("doc_id").as("b_id"), col("sh").as("sh_b"))
    candidates
      .join(sa, "a_id").join(sb, "b_id")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))) /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Full near-dup pipeline: LSH candidates -> exact Jaccard filter. */
  def minhashNearDups(docs: DataFrame, threshold: Double = 0.8,
                      k: Int = 128, bands: Int = 32): DataFrame =
    jaccardVerify(minhashCandidates(docs, k, bands), withShingles(docs), threshold)

  /** SimHash fingerprints (64-bit, over word-3-gram hashes). */
  def simhashed(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    withShingles(docs, 3, idCol, textCol)
      // full 64-bit hashes here (unlike the 31-bit minhash base): the
      // simhash vote samples bits 0..62 of each element hash
      .withColumn("base", transform(col("sh"), s => xxhash64(s)))
      .withColumn("simhash", simhash64("base"))
      .select(col(idCol), col("simhash"))

  /** SimHash near-dup candidates: 4 blocks of 16 bits; a pair differing
    * in ≤ maxHamming bits must agree on ≥1 whole block when
    * maxHamming < 4·4 is spread across blocks (pigeonhole for ≤3).
    * Block-bucket join + exact hamming filter. */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simhashed(docs)
    val blocks = fp.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        expr(s"shiftright(simhash, ${i * 16}) & 65535")): _*)).as(Seq("block_idx", "block_val")))
    val a = blocks.as("a")
    val b = blocks.as("b")
    a.join(b,
        col("a.block_idx") === col("b.block_idx") &&
          col("a.block_val") === col("b.block_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        hamming64(col("a.simhash"), col("b.simhash")).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs above `threshold`.
    *
    * `allPairs=true` is the exact small-N path (used by the oracle gate:
    * a broadcast nested-loop over id-ordered pairs). The 100 TB path is
    * `allPairs=false`: LSH-bucketed candidates via [[Similarity]] bound
    * the comparisons. */
  def embeddingNearDups(emb: DataFrame, threshold: Double,
                        allPairs: Boolean = true): DataFrame = {
    val e = emb.select(col("vec_id"), vecD(col("embedding")).as("v"))
      .withColumn("norm", l2Norm(col("v")))
    val aSide = e.select(col("vec_id").as("a_id"), col("v").as("av"), col("norm").as("anorm"))
    val bSide = e.select(col("vec_id").as("b_id"), col("v").as("bv"), col("norm").as("bnorm"))
    val pairs =
      if (allPairs)
        aSide.join(bSide, col("a_id") < col("b_id"))
      else {
        val buckets = Similarity.lshBuckets(e, "v")
        val cand = buckets.as("x").join(buckets.as("y"),
            col("x.table_idx") === col("y.table_idx") &&
              col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
          .distinct()
        cand.join(aSide, "a_id").join(bSide, "b_id")
      }
    pairs.select(
        col("a_id"), col("b_id"),
        round(cosineWithNorms(dotProduct(col("av"), col("bv")),
          col("anorm"), col("bnorm")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
