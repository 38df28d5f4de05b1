package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingPrep
import graft.sources.Ingestor

/** Declarative corpus-prep spec: one JSON drives quality -> language ->
  * dedup -> split, matching the hand-built training_corpus plan. */
class TrainingPrepSpec extends SparkSpec {

  test("json spec reproduces the hand-built training_corpus pipeline") {
    val docs = Ingestor.table(spark, sf(), "documents")
    val spec =
      """{ "quality":  { "min_score": 0.5 },
        |  "language": { "keep": ["en"] },
        |  "dedup":    { "method": "exact" },
        |  "split":    { "fractions": { "train": 0.8, "val": 0.1 } } }""".stripMargin
    val prep = TrainingPrep.fromJson(spec)(docs)
      .select("doc_id", "lang_pred", "quality_score", "split")
      .orderBy("doc_id").collect().toSeq
    val reference = SparkEntry.queries("training_corpus")(spark, sf())
      .collect().toSeq
    assert(prep == reference)
  }

  test("minhash dedup stage drops near-dups while keeping enrichment columns") {
    val docs = Ingestor.table(spark, sf(), "documents")
    val spec = """{ "quality": { "min_score": 0.0 },
                 |  "dedup": { "method": "minhash", "threshold": 0.8 } }""".stripMargin
    val out = TrainingPrep.fromJson(spec)(docs)
    assert(out.columns.contains("quality_score"), "enrichments survive dedup")
    val dropped = docs.count() - out.count()
    val losers = graft.operators.Dedup.minhashNearDups(docs, 0.8)
      .select("b_id").distinct().count()
    assert(dropped == losers, s"dropped $dropped, expected $losers")
  }

  test("unknown dedup method fails fast") {
    val docs = Ingestor.table(spark, sf(), "documents")
    intercept[IllegalArgumentException] {
      TrainingPrep.fromJson("""{ "dedup": { "method": "nope" } }""")(docs).count()
    }
  }
}
