package graft

import org.apache.spark.sql.functions._

/** Stage-level profile of `corpus_attribution` (run with
  * `Test/runMain graft.AttrProbe <sfDir>`): where does the wall go —
  * shingling, the gram join + (doc, bench) count aggregate, or the
  * per-doc top-1 window? Drives the packed-argmax decision with
  * numbers instead of guesses (r12 lesson: profile BEFORE optimizing). */
object AttrProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = Sessions.local(appName = "graft-attr-probe")
    spark.sparkContext.setLogLevel("WARN")
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = all.where(col("doc_id") % 7 =!= 0)
    val bench = all.where(col("doc_id") % 7 === 0)
    def timeIt(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime
      f.write.format("noop").mode("overwrite").save()
      println(f"ATTRPROBE $tag ${(System.nanoTime - t) / 1e9}%.1f s")
    }
    import graft.operators.Contamination
    val corpusGrams = Contamination.ngramHashes(corpus, 8)
    val benchGrams = Contamination.ngramHashes(bench, 8)
      .select(col("doc_id").as("bench_id"), col("gram")).distinct()
    timeIt("corpus_shingle")(corpusGrams)
    timeIt("bench_shingle_distinct")(benchGrams)
    val pairCounts = corpusGrams.join(benchGrams, "gram")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("shared_ngrams"))
    timeIt("join_plus_paircount")(pairCounts)
    timeIt("full_attribution")(
      Contamination.attributeOverlap(corpus, bench, n = 8))
    // A/B: same join + aggregate with LONG gram keys (xxhash64 of the
    // hex string) — isolates how much of the join stage is string-key
    // shuffle/hash overhead vs inherent fan-out row count.
    val corpusL = corpusGrams.withColumn("gram", xxhash64(col("gram")))
    val benchL = benchGrams.withColumn("gram", xxhash64(col("gram")))
    val pairCountsL = corpusL.join(benchL, "gram")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("shared_ngrams"))
    timeIt("join_paircount_longkey")(pairCountsL)
    timeIt("join_paircount_longkey2")(pairCountsL)
    println("ATTRPROBE pair_rows=" + pairCounts.count())
    spark.stop()
  }
}
