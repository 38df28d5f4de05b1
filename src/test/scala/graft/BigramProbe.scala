package graft

import org.apache.spark.sql.functions._

/** Stage probe of text_bigram_lp (run with
  * `Test/runMain graft.BigramProbe <sfDir>`): the corpus is tokenized
  * in three separate subtrees (uni counts, bigram counts, scoring
  * pairs) — uni's diamond reuses its exchange, but bi-vs-pairs cannot
  * (aggregate vs raw explode). Does materializing the per-doc token
  * arrays once pay at sf10? */
object BigramProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = Sessions.local(appName = "graft-bigram-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime
      f.write.format("noop").mode("overwrite").save()
      println(f"BIGRAMPROBE $tag ${(System.nanoTime - t) / 1e9}%.1f s")
    }
    import graft.operators.TextAnalysis
    time("full_current")(TextAnalysis.bigramLogProb(docs))
    time("full_current2")(TextAnalysis.bigramLogProb(docs))
    // how many FileScans does the executed plan carry?
    val full = TextAnalysis.bigramLogProb(docs)
    full.write.format("noop").mode("overwrite").save()
    val scans = full.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan parquet"))
    println(s"BIGRAMPROBE file_scans=$scans")
    spark.stop()
  }
}
