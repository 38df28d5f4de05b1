package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-host A/B of the three dedup_simhash forms (r19 verdict item 1):
  *   A  Simhash64 expression + localCheckpoint barrier (the shipped form)
  *   B  Simhash64 expression, NO barrier (both join sides recompute)
  *   C  the r18 63-SUM aggregate vote feeding the same block join, no
  *      barrier (its aggregation exchange is the potential reuse point)
  * Interleaved reps, fresh noop sink per arm, forced GC per window —
  * the DRIFT double-run shape. Run with
  * `Test/runMain graft.SimhashAbProbe <sfDir> [reps]`. */
object SimhashAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/data/sf10"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.local(appName = "graft-simhash-ab")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(tag: String)(f: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      f
      println(f"SIMHASH_AB $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // hammingNearDups body minus the barrier, for the B/C arms
    def pairsNoBarrier(fp: DataFrame): DataFrame = {
      val base = fp.select(col("doc_id").as("__id"), col("simhash").as("__h"))
      val blocks = base.select(col("__id"), col("__h"),
        posexplode(array((0 until 4).map(i =>
          shiftright(col("__h"), i * 16).bitwiseAND(lit(65535L))): _*))
          .as(Seq("block_idx", "block_val")))
      val a = blocks.as("a")
      val b = blocks.as("b")
      a.join(b,
          col("a.block_idx") === col("b.block_idx") &&
            col("a.block_val") === col("b.block_val") &&
            col("a.__id") < col("b.__id"))
        .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
          graft.functions.hamming64(col("a.__h"), col("b.__h"))
            .cast("long").as("hamming"))
        .distinct()
        .where(col("hamming") <= 3)
    }

    def legacyAggFp: DataFrame = {
      val hashed = Dedup.shingleHashSets(docs, 3)
        .select(col("doc_id"), explode(col("shash")).as("h"))
      val votes = (0 until 63).map { b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"bit_$b")
      }
      val fold = (0 until 63).map { b =>
        when(col(s"bit_$b") >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
      hashed.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .select(col("doc_id"), fold.as("simhash"))
    }

    (1 to reps).foreach { r =>
      time(s"A expr+barrier   r$r") {
        noop(Dedup.simhashNearDups(docs, 3).orderBy("a_id", "b_id"))
      }
      time(s"B expr-nobarrier r$r") {
        noop(pairsNoBarrier(Dedup.simhashed(docs)).orderBy("a_id", "b_id"))
      }
      time(s"C legacy-agg     r$r") {
        noop(pairsNoBarrier(legacyAggFp).orderBy("a_id", "b_id"))
      }
    }
    spark.stop()
  }
}
