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

  test("redact stage rewrites text after dedup, keeping audit counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact a@b.io today"),
      (2L, "contact a@b.io today"), // exact dup of 1 (same pre-redaction text)
      (3L, "contact c@d.io today")) // dup of 1 only AFTER redaction
      .toDF("doc_id", "text")
    val spec = """{ "dedup": { "method": "exact" }, "redact": {} }"""
    val out = TrainingPrep.fromJson(spec)(docs)
      .select("doc_id", "text", "n_emails")
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    // dedup saw original text: 3 survives (not a pre-redaction dup of 1)
    assert(out == Seq(
      (1L, "contact <EMAIL> today", 1L),
      (3L, "contact <EMAIL> today", 1L)))
  }

  test("repetition stage drops looping docs, keeps healthy ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "a genuinely varied sentence with many different interesting words inside"))
      .toDF("doc_id", "text")
    val out = TrainingPrep.fromJson("""{ "repetition": {} }""")(docs)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("decontaminate stage removes benchmark-overlapping docs") {
    import spark.implicits._
    val shared = "one two three four five six seven eight"
    val benchDir = java.nio.file.Files.createTempDirectory("graft_bench").toString + "/b"
    Seq((100L, s"eval prompt $shared answer")).toDF("doc_id", "text")
      .write.parquet(benchDir)
    val docs = Seq(
      (1L, s"leaked text containing $shared right here"),
      (2L, "completely clean document with no overlap at all present"))
      .toDF("doc_id", "text")
    val spec = s"""{ "decontaminate": { "benchmark_path": "$benchDir", "ngram": 8 } }"""
    val out = TrainingPrep.fromJson(spec)(docs)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("mixture + pack stages compose with split into one prepared corpus") {
    val docs = Ingestor.table(spark, sf(), "documents")
    val spec =
      """{ "mixture": { "domain_col": "source",
        |               "weights": { "src0": 0.5, "src1": 0.5 }, "budget": 20 },
        |  "split":   { "fractions": { "train": 0.8, "val": 0.1 } },
        |  "pack":    { "budget": 256 } }""".stripMargin
    val out = TrainingPrep.fromJson(spec)(docs)
    assert(out.columns.toSet.intersect(
      Set("split", "seq_id", "seq_offset", "n_seqs", "pack_tokens")).size == 5)
    val sources = out.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(sources.subsetOf(Set("src0", "src1")))
    assert(out.count() > 0)
    // packing matches running the operator directly on the same survivors
    val direct = graft.operators.Packing.packSequences(
      out.select("doc_id", "text"), budget = 256L)
    val joined = out.select("doc_id", "seq_id")
      .join(direct.withColumnRenamed("seq_id", "seq_id_d"), "doc_id")
    assert(joined.where(col("seq_id") =!= col("seq_id_d")).count() == 0)
  }

  test("lm_quality stage drops rare-token gibberish, keeps fluent text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common words appear here and common words repeat again"),
      (2L, "zzqx vwky pfjm qnbt hklw"), // singleton tokens -> low logprob
      (3L, "common words appear again here")).toDF("doc_id", "text")
    val out = TrainingPrep.fromJson(
      """{ "lm_quality": { "min_avg_logprob": -2.5 } }""")(docs)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("training_prep runs as a pipeline transformation stage") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_prep_pipe").toString + "/out"
    val spec =
      s"""{ "ingestion": { "path": "${sf()}/documents.parquet" },
         |  "transformation": [ { "type": "training_prep", "spec": {
         |      "quality": { "min_score": 0.5 },
         |      "split":   { "fractions": { "train": 0.9 } } } } ],
         |  "persistence": { "path": "$outDir", "strategy": "replace" } }""".stripMargin
    val result = graft.pipeline.Pipeline.runJson(spark, spec)
    assert(result.output.columns.contains("split"))
    val written = spark.read.parquet(outDir)
    assert(written.count() > 0 && written.count() == result.output.count())
    assert(written.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "test")))
  }

  test("unknown dedup method fails fast") {
    val docs = Ingestor.table(spark, sf(), "documents")
    intercept[IllegalArgumentException] {
      TrainingPrep.fromJson("""{ "dedup": { "method": "nope" } }""")(docs).count()
    }
  }
}
