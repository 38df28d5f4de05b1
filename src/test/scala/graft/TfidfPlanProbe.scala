package graft

import org.apache.spark.sql.functions._

/** Print the executed adaptive plan of text_tfidf with partition
  * counts — which exchange does AQE coalesce, and to how many tasks?
  * Run with `Test/runMain graft.TfidfPlanProbe <sfDir>`. */
object TfidfPlanProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = Sessions.local(appName = "graft-tfidf-plan")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val full = graft.operators.TextAnalysis.tfidf(docs)
    full.write.format("noop").mode("overwrite").save()
    println("=== executed plan ===")
    println(full.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
