// Dump .explain("formatted") for a list of queries into plans/<dir>/<q>_<suffix>.txt
// Usage: spark-shell --conf spark.driver.extraClassPath=<classes> -i tools/plan_dump.scala
// with env PLAN_QUERIES="q1,q2" PLAN_OUT=plans/r20 PLAN_SUFFIX=before PLAN_SF=/root/testdata/sf0.01
val qs = sys.env("PLAN_QUERIES").split(",").map(_.trim).filter(_.nonEmpty)
val outDir = sys.env.getOrElse("PLAN_OUT", "plans/r20")
val suffix = sys.env.getOrElse("PLAN_SUFFIX", "before")
val sfDir = sys.env.getOrElse("PLAN_SF", "/root/testdata/sf0.01")
java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
graft.Sessions.tune(spark)
for (q <- qs) {
  try {
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"), plan)
    println(s"PLANDUMP ok $q")
  } catch { case e: Throwable => println(s"PLANDUMP FAIL $q: ${e.getMessage}") }
}
sys.exit(0)
