package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: run every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * print one JSON line. Results are written to a noop sink so the FULL
  * plan executes (a bare .count() lets Catalyst prune every unused
  * column, which benchmarks a much cheaper query than the real one). */
object Bench {

  /** Oracle-gate-only queries: the documented all-pairs ground-truth
    * feeds (quadratic by construction — they exist to certify the
    * bucketed paths' recall at the oracle SF, and no deployment runs
    * them). Excluded from campaigns at sf >= 0.1 so every at-scale
    * number is a deployment path; still benched when explicitly named. */
  val oracleOnly: Set[String] = Set("dedup_embedding", "emb_clusters")

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
    val sfVal = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).toDouble).getOrElse(0.0)
    val skipped =
      if (wanted.isEmpty && sfVal >= 0.1) oracleOnly else Set.empty[String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => (wanted.isEmpty || wanted(n)) && !skipped(n) }
    // Median-of-3 policy: loop-driven queries always (one Spark job per
    // Lloyd/label-propagation round — a single transient stall
    // multiplies into the recorded time), and ADAPTIVELY any query whose
    // first run takes >=0.3s (r8's official artifact logged 6 sub-1.5s
    // queries at 1.5-2.1x their quiet-run times under mid-run load; the
    // old 1s threshold left exactly that band single-run). Queries under
    // 0.3s stay single-run: their noise floor is bounded by their cost.
    val iterative = Set("dedup_clusters", "knn_ivf", "knn_ivfpq", "knn_ivfpq_probe")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    // Protocol ENFORCEMENT (not just self-description): if the 1-min
    // load is above `loadLimit` right after a query was timed, the
    // number is suspect — wait for the load to decay (bounded), re-run
    // the full median protocol once, and if load is STILL high, flag
    // the query and mark the artifact non-official. The signal is the
    // SYSTEM load average, which includes the bench's own threads: at
    // sf0.1 queries are sub-second and the 1-min EMA stays in the 2-5
    // band (so >8 means something ELSE is running), but at sf>=1
    // seconds-long 32-thread queries legitimately hold the EMA at
    // 8-16 — a fixed 8 would self-trigger on every heavy query. The
    // default therefore scales with the campaign SF; override with
    // SPARK_GRAFT_LOAD_LIMIT when the machine's quiet band differs.
    val loadLimit = sys.env.get("SPARK_GRAFT_LOAD_LIMIT").map(_.toDouble)
      .getOrElse(if (sfVal >= 1.0) 24.0 else 8.0)
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
      def measured(): Double = {
        val first = once()
        if (iterative(name) || first >= 0.3)
          (first +: Seq.fill(2)(once())).sorted.apply(1)
        else first
      }
      var t = measured()
      var flagged = false
      if (osBean.getSystemLoadAverage > loadLimit) {
        var waited = 0
        while (osBean.getSystemLoadAverage > loadLimit && waited < 30) {
          Thread.sleep(5000); waited += 5
        }
        t = measured()
        flagged = osBean.getSystemLoadAverage > loadLimit
        if (flagged) System.err.println(
          s"[bench] $name re-measured under persistent load > $loadLimit — flagged")
      }
      (name, t, flagged)
    }
    val loadEnd = osBean.getSystemLoadAverage
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val flaggedNames = results.collect { case (k, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val skippedNames = skipped.toSeq.sorted.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    // The artifact self-describes its measurement conditions: the bench
    // protocol (see BASELINE.md) requires a quiet machine; load averages
    // are recorded AND enforced (queries re-measured once if the 1-min
    // load passed loadLimit; "official" is false when any stayed loaded).
    val ctx = f""""protocol":"median3 for loop-driven or >=0.3s queries; load>$loadLimit%.0f => wait+remeasure, flag if persistent",""" +
      f""""load_avg_start":$loadStart%.2f,"load_avg_end":$loadEnd%.2f,""" +
      s""""load_flagged":$flaggedNames,"official":${results.forall(!_._3)},""" +
      s""""skipped_oracle_only":$skippedNames"""
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
      .map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val n = results.size
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","n":$n,"queries":$top5,"sf":"$sfDir","full":"$outPath"}""")
    spark.stop()
  }
}
