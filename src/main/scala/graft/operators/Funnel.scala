package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation-funnel attrition audit: WHY did each document leave the
  * corpus, and how much volume left with it?
  *
  * A training-data pipeline is a cascade of drop stages (length →
  * language → quality → dedup → ...), and the release question "we
  * started with 12 B docs and shipped 3 B — where did the other 9 B
  * go?" is answered by attributing every input doc to the FIRST stage
  * that would drop it, then rolling volumes up per stage. The reference
  * records only per-run row counts (`utils/metrics.py`,
  * `workers/tasks.py` result dicts) — per-stage attrition over a
  * declarative stage list is the Spark-first generalization.
  *
  * Scale shape: the attribution is one `when` cascade evaluated inside
  * the corpus scan (codegen'd, zero shuffle) and the rollup is one
  * map-side-combined group-by whose key cardinality is the stage count,
  * so the output — and the share window that runs over it — is
  * stage-sized regardless of corpus size. Stages whose predicates need
  * corpus context (e.g. an exact-dup rank) are composed by the caller
  * as precomputed columns, so this operator never hides a shuffle. */
object Funnel {

  /** Attribute each row to the first of `stages` whose predicate holds
    * (order = pipeline order), else `"kept"`; roll up doc counts plus
    * the given `volumes` (name -> column summed as BIGINT) per stage.
    * Output: (stage_idx, stage, docs, <volumes...>, doc_share), ordered
    * by pipeline position; stages that drop nothing emit no row (the
    * rollup reports observed attrition, not the stage catalog). */
  def attrition(df: DataFrame, stages: Seq[(String, Column)],
                volumes: Seq[(String, Column)] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stages.nonEmpty, "at least one stage")
    val stageCol = stages.foldRight(lit("kept")) { case ((name, pred), rest) =>
      when(pred, lit(name)).otherwise(rest)
    }
    val idx = (stages.map(_._1) :+ "kept").zipWithIndex
    val idxCol = idx.foldRight(lit(-1L)) { case ((name, i), rest) =>
      when(col("stage") === name, lit(i.toLong)).otherwise(rest)
    }
    val aggs = (count(lit(1)).as("docs") +:
      volumes.map { case (n, c) => sum(c).cast("long").as(n) })
    val rolled = df.withColumn("stage", stageCol)
      .groupBy("stage").agg(aggs.head, aggs.tail: _*)
    // the share window runs over the stage-sized rollup, never the data
    val w = Window.partitionBy(lit(1))
    rolled.withColumn("stage_idx", idxCol)
      .withColumn("doc_share", round(col("docs") / sum(col("docs")).over(w), 6))
      .select((Seq("stage_idx", "stage", "docs") ++ volumes.map(_._1) :+
        "doc_share").map(col): _*)
      .orderBy("stage_idx")
  }
}
