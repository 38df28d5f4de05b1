package graft

/** Generic multi-scan smell detector (run with
  * `Test/runMain graft.ScanCountProbe <sfDir> <query...>`): executes
  * each named SparkEntry query with a noop sink and prints how many
  * FileScan nodes the executed adaptive plan carries. >1 scan of the
  * same table in a single-table operator is the tfidf/bigram defect
  * class (exchange reuse defeated by divergent pruning). */
object ScanCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local(appName = "graft-scan-probe")
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      try {
        val t = System.nanoTime
        val df = SparkEntry.queries(q)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.executedPlan.toString
        val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
        val tables = plan.linesIterator.filter(_.contains("FileScan parquet"))
          .map(l => l.slice(l.indexOf("[file:"), l.length).takeWhile(_ != ']'))
          .toSeq.groupBy(identity).map { case (k, v) => s"${v.size}x${k.split('/').lastOption.getOrElse("?")}" }
        println(f"SCANPROBE $q%-28s ${(System.nanoTime - t) / 1e9}%6.1f s  scans=$scans  ${tables.mkString(" ")}")
      } catch {
        case e: Exception => println(s"SCANPROBE $q ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
