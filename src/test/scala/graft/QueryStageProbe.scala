package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage split of ANY declared query at a given SF — wall, task CPU,
  * input/shuffle record counts per stage, so optimization targets the
  * real cost (guide §1). Run with
  * `Test/runMain graft.QueryStageProbe <query> <sfDir>`. */
object QueryStageProbe {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/repo/data/sf10"
    val spark = Sessions.local(appName = s"graft-stage-probe-$q")
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
    graft.SparkEntry.queries(q)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"QSTAGE $q e2e ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    Thread.sleep(500)
    done.sortBy(_._1).foreach { case (id, w, cpu, in, sr, sw, n) =>
      if (w >= 0.1) println(
        f"QSTAGE stage=$id%-4d wall=$w%7.2f cpu=$cpu%8.2f in=$in%11d sRead=$sr%11d sWrite=$sw%11d  $n") }
    spark.stop()
  }
}
