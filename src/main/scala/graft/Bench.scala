package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: run every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * print one JSON line. Results are written to a noop sink so the FULL
  * plan executes (a bare .count() lets Catalyst prune every unused
  * column, which benchmarks a much cheaper query than the real one). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Sessions.tuning.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmupDir = "/root/testdata/sf0.001"
    // Optional args = query names to bench (iteration aid); no args = all.
    val wanted = args.toSet
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
    // Median-of-3 policy: loop-driven queries always (one Spark job per
    // Lloyd/label-propagation round — a single transient stall
    // multiplies into the recorded time), and ADAPTIVELY any query whose
    // first run takes >=1s (multi-action queries are exactly the ones
    // where r6/r7 official artifacts recorded machine load as phantom
    // regressions). Sub-second queries stay single-run: their noise
    // floor is bounded by their own cost.
    val iterative = Set("dedup_clusters", "knn_ivf", "knn_ivfpq", "knn_ivfpq_probe")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    val results = selected.map { case (name, fn) =>
      // Untimed warmup at the smallest SF: compiles the query's generated
      // code + loads classes so the timed run measures execution, not
      // first-use JIT/codegen (worth 1-4s per query pattern otherwise).
      try fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val first = once()
      val times =
        if (iterative(name) || first >= 1.0) (first +: Seq.fill(2)(once())).sorted
        else Seq(first)
      name -> times(times.size / 2)
    }
    val loadEnd = osBean.getSystemLoadAverage
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // The artifact self-describes its measurement conditions: the bench
    // protocol (see BASELINE.md) requires a quiet machine, and the 1-min
    // system load average before/after is recorded so a reader can tell
    // a loaded-machine record from a plan change without a re-run.
    val ctx = f""""protocol":"median3 for loop-driven or >=1s queries",""" +
      f""""load_avg_start":$loadStart%.2f,"load_avg_end":$loadEnd%.2f"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$ctx}"""
    // The per-query blob grows with the query count (~4 KB at 90 queries)
    // and harness log captures may keep only a bounded head/tail of stdout.
    // So: persist the FULL record to a file, and make the only stdout line
    // a compact JSON (total + top-5 slowest + file pointer) that stays well
    // under any plausible capture bound and parses whether the capture
    // keeps the head or the tail.
    val outPath = java.nio.file.Paths
      .get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
      .toAbsolutePath
    java.nio.file.Files.write(outPath,
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val top5 = results.sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val n = results.size
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","n":$n,"queries":$top5,"sf":"$sfDir","full":"$outPath"}""")
    spark.stop()
  }
}
