package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Runtime-adaptivity evidence for the 100 TB story: the session tuning
  * in [[Sessions.tuning]] turns AQE + skew-join + partition coalescing
  * on, and every claim so far was "the static plan is right". These
  * tests execute deliberately pathological shuffles and assert the
  * ADAPTIVE runtime actually re-plans them — a skewed join partition is
  * split across tasks, and an over-partitioned shuffle is coalesced —
  * by inspecting the final (post-execution) adaptive plan, not the
  * static one. If a future conf change silently disables either
  * mechanism, these fail. */
class AqeScaleSpec extends SparkSpec {

  /** The final plan AQE actually ran (only materialized after an action). */
  private def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .getOrElse(p)
    }

  /** collect() that descends into materialized query stages —
    * QueryStageExec is a LEAF node whose executed subtree hangs off
    * `.plan`, so a plain collect never sees the AQEShuffleRead inside. */
  private def shuffleReads(p: SparkPlan): Seq[AQEShuffleReadExec] = {
    val here = p match {
      case r: AQEShuffleReadExec => Seq(r)
      case _                     => Nil
    }
    val below = p match {
      case q: QueryStageExec => shuffleReads(q.plan)
      case _                 => p.children.flatMap(shuffleReads)
    }
    here ++ below
  }

  /** Executes the DataFrame's OWN physical plan (df.write plans a fresh
    * QueryExecution, leaving df's adaptive plan un-finalized — inspecting
    * it would show the initial, pre-AQE plan). */
  private def run(df: DataFrame): Unit = { df.queryExecution.toRdd.count(); () }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      k -> scala.util.Try(Option(spark.conf.get(k))).toOption.flatten
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    withConf(
      // force a shuffled join (the dim would broadcast otherwise)...
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // ...and lower the skew thresholds so test-sized data trips them
      // (defaults are tuned for multi-GB partitions).
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024"
    ) {
      // One hot key carries 95% of the fact rows — the single-partition
      // straggler shape that kills a naive 1000-executor join.
      val fact = spark.range(300000).select(
        when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 97).as("k"),
        col("id").as("v"),
        lpad(lit("x"), 48, "x").as("pad"))
      val dim = spark.range(97).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      run(joined)

      val plan = finalPlan(joined)
      val reads = shuffleReads(plan)
      assert(reads.nonEmpty, s"no AQEShuffleRead in final plan:\n$plan")
      assert(reads.exists(_.hasSkewedPartition),
        s"skewed partition was not split by AQE:\n$plan")
      assert(plan.toString.contains("skew=true"),
        s"join not marked as skew-optimized:\n$plan")
    }
  }

  test("AQE coalesces an over-partitioned shuffle to match the data size") {
    withConf(
      // 200 shuffle partitions for ~2 MB of data: the classic
      // mis-sized-cluster shape. parallelismFirst=false makes the
      // coalescer honor the advisory size instead of local parallelism.
      "spark.sql.shuffle.partitions" -> "200",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "67108864"
    ) {
      val agg = spark.range(100000)
        .groupBy((col("id") % 101).as("k")).agg(sum("id").as("s"))
      run(agg)

      val plan = finalPlan(agg)
      val reads = shuffleReads(plan)
      assert(reads.nonEmpty, s"no AQEShuffleRead in final plan:\n$plan")
      assert(reads.exists(_.hasCoalescedPartition),
        s"shuffle read was not coalesced:\n$plan")
      val parts = reads.map(_.partitionSpecs.size).min
      assert(parts < 20,
        s"expected ~1 coalesced partition for 2 MB of data, got $parts:\n$plan")
    }
  }
}
