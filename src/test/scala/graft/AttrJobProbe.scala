package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Per-job wall/stage split of the corpus_attribution e2e at a given SF
  * — the coarse and sub-stage probes measured pieces in isolation but
  * the e2e stayed ~32 s, so this one watches the REAL query's jobs.
  * Run with `Test/runMain graft.AttrJobProbe <sfDir>`. */
object AttrJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val spark = Sessions.local(appName = "graft-attr-job-probe")
    spark.sparkContext.setLogLevel("WARN")
    val jobs = mutable.Map[Int, (Long, String)]()
    val done = mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs(j.jobId) = (j.time,
          Option(j.properties.getProperty("spark.job.description"))
            .getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.remove(j.jobId).foreach { case (t0, d) =>
          done += ((j.jobId, (j.time - t0) / 1e3, d)) }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("corpus_attribution")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"ATTRJOB e2e ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    Thread.sleep(500)
    done.sortBy(_._1).foreach { case (id, s, d) =>
      if (s >= 0.15) println(f"ATTRJOB job=$id%-4d $s%7.2f s  $d") }
    spark.stop()
  }
}
