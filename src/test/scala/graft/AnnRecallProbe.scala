package graft

import org.apache.spark.sql.functions._

/** Diagnostic sweep: IVF recall vs nprobe at the oracle SF, unfiltered
  * and label-filtered, against the matching brute-force ground truth.
  * Run with `Test/runMain graft.AnnRecallProbe <sfDir>`. Used to pick
  * the selectivity-scaled nprobe defaults and the invariant floors. */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.local(appName = "graft-ann-recall-probe")
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val labels = Seq(1, 3, 5)

    def recall(ann: org.apache.spark.sql.DataFrame,
               exact: org.apache.spark.sql.DataFrame): Double = {
      val hits = ann.select("q_id", "n_id")
        .join(exact.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
      hits.toDouble / math.max(1L, exact.count())
    }

    val brute = graft.operators.Similarity
      .knnBrute(emb, col("vec_id") < 10, k = 10).localCheckpoint()
    val bruteF = graft.operators.Similarity
      .knnBrute(emb, col("vec_id") < 10, k = 10,
        corpusFilter = col("label").isin(labels: _*)).localCheckpoint()

    for (np <- Seq(4, 6, 8, 10, 12)) {
      val r = recall(graft.operators.Similarity.knnIvf(
        emb, col("vec_id") < 10, k = 10, nprobe = np), brute)
      val rf = recall(graft.operators.Similarity.knnIvf(
        emb, col("vec_id") < 10, k = 10, nprobe = np,
        corpusFilter = col("label").isin(labels: _*)), bruteF)
      println(f"ANNPROBE nprobe=$np%2d  ivf=$r%.3f  ivf_filtered=$rf%.3f")
    }
    spark.stop()
  }
}
