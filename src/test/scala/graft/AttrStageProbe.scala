package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Per-stage split of corpus_attribution at a given SF — the job probe
  * put 25 s in one fused job; this one attributes it to stages (gram
  * scan vs gram join vs pair aggregation) via task-time totals.
  * Run with `Test/runMain graft.AttrStageProbe <sfDir>`. */
object AttrStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val spark = Sessions.local(appName = "graft-attr-stage-probe")
    spark.sparkContext.setLogLevel("WARN")
    val done = mutable.ArrayBuffer[(Int, Double, Double, Long, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        val m = i.taskMetrics
        done += ((i.stageId, wall, m.executorRunTime / 1e3,
          m.inputMetrics.recordsRead, m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.recordsWritten,
          i.name.takeWhile(_ != '\n').take(60)))
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("corpus_attribution")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"ATTRSTAGE e2e ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    Thread.sleep(500)
    done.sortBy(_._1).foreach { case (id, w, cpu, in, sr, sw, n) =>
      if (w >= 0.1) println(
        f"ATTRSTAGE stage=$id%-4d wall=$w%7.2f cpu=$cpu%8.2f in=$in%11d sRead=$sr%11d sWrite=$sw%11d  $n") }
    spark.stop()
  }
}
