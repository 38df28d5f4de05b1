package graft

/** Diagnostic A/B: star-alternation vs hash-min closure over a stored
  * pair relation (run with `Test/runMain graft.CcProbe <pairsDir>
  * <docsParquet>`); prints wall + rounds per variant. Test-scoped so it
  * can reach the private[graft] hash-min reference. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val Array(pairsDir, docsPath) = args
    val spark = Sessions.local(appName = "graft-cc-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(docsPath)
    val pairs = spark.read.parquet(pairsDir)
    def timeIt(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime
      f.write.format("noop").mode("overwrite").save()
      println(f"CCPROBE $tag ${(System.nanoTime - t) / 1e9}%.1f s rounds=" +
        graft.operators.Dedup.lastCcRounds)
    }
    timeIt("STAR")(graft.operators.Dedup.connectedComponentsStars(pairs, docs))
    timeIt("HASHMIN")(graft.operators.Dedup.connectedComponentsHashMin(pairs, docs))
    timeIt("STAR2")(graft.operators.Dedup.connectedComponentsStars(pairs, docs))
    timeIt("HASHMIN2")(graft.operators.Dedup.connectedComponentsHashMin(pairs, docs))
    spark.stop()
  }
}
