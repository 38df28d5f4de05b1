package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions.{dequantizeVec, dotBytes, dotD, quantizeVec}
import graft.functions._

/** Int8 embedding quantization — the storage/shipping form a 100 TB
  * vector corpus actually uses (float32 embeddings quantize 4x smaller
  * with negligible cosine loss; FAISS's SQ8, ScaNN's int8 leg): a
  * per-vector symmetric scheme (scale = max|x|/127) implemented as
  * codegen'd Catalyst expressions ([[graft.expressions.QuantizeVec]] /
  * [[graft.expressions.DequantizeVec]] /
  * [[graft.expressions.ByteDotProduct]]) — no UDFs, no shuffle, the
  * quantize/score kernels ride whole-stage codegen like every other
  * vector op here.
  *
  * Where it sits in the similarity family: [[Similarity]]'s IVF-PQ is
  * the sublinear INDEX (cells + product codes); this is the FLAT
  * compressed form — exact-shape brute scoring over 8x-smaller
  * operands, the right tool when the query batch is large relative to
  * the corpus slice (re-rank feeds, drift audits) or as the storage
  * encoding under any of the candidate generators. Key property the
  * per-vector scheme buys: COSINE NEEDS NO SCALES — they cancel,
  * cos ≈ byteDot(a,b) / (sqrt(byteDot(a,a)) · sqrt(byteDot(b,b))), so
  * the scoring path touches only the 1-byte codes. */
object Quantize {

  /** Corpus + int8 codes: (vec_id, v, codes, scale, norm2) with norm2 =
    * the integer self-dot of the codes (the cosine denominator piece). */
  def quantized(emb: DataFrame, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    spread(emb, col(idCol))
      .select(col(idCol).as("vec_id"), vecD(col(vecCol)).as("v"))
      .withColumn("__q", quantizeVec(col("v")))
      .select(col("vec_id"), col("v"),
        col("__q").getField("codes").as("codes"),
        col("__q").getField("scale").as("scale"))
      .withColumn("norm2", dotBytes(col("codes"), col("codes")))

  /** Per-vector quantization-fidelity audit: the empirical cosine
    * between each vector and its dequantized self, the constructive
    * per-component error bound (scale/2), and the byte footprint —
    * the report that justifies shipping int8 for a given encoder.
    * Pure map stage; the elementwise max-error uses one HOF pair
    * (audit-only — the serving path never runs it). */
  def audit(emb: DataFrame, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val q = quantized(emb, idCol, vecCol)
      .withColumn("deq", dequantizeVec(col("codes"), col("scale")))
    // ANSI mode: 0/0 THROWS, so the zero-vector case (norm 0) must be
    // branched before the division — a zero vector quantizes exactly,
    // so its fidelity is reported as 1.0
    val denom = sqrt(dotD(col("v"), col("v"))) * sqrt(dotD(col("deq"), col("deq")))
    q.select(col("vec_id"),
        size(col("v")).cast("long").as("dim"),
        round(col("scale"), 6).as("scale"),
        when(denom === 0, lit(1.0))
          .otherwise(round(dotD(col("v"), col("deq")) / denom, 6)).as("cos_q"),
        round(aggregate(zip_with(col("v"), col("deq"), (a, b) => abs(a - b)),
          lit(0.0), (acc, e) => greatest(acc, e)), 6).as("max_abs_err"),
        round(col("scale") / 2, 6).as("err_bound"))
  }

  /** Top-k cosine neighbours scored on int8 codes with an exact float
    * re-rank of the survivors: stage 1 ranks every candidate pair by
    * the codes-only cosine (scales cancel — the hot loop is one byte
    * multiply-accumulate per dimension over operands 8x smaller than
    * the double form), keeps `refine`·k per query; stage 2 re-scores
    * ONLY those with the exact double-precision cosine, so returned
    * neighbours carry true similarities and the output matches
    * [[Similarity.knnBrute]] wherever stage 1's recall holds
    * (spec-measured ≥0.9 recall@k at refine=4 on the test embeddings).
    * Same output contract as knnBrute: (q_id, n_id, rank, cos_sim),
    * 6-dp rounding, id tie-breaks. */
  def knnQuantized(emb: DataFrame, isQuery: Column, k: Int = 10,
                   refine: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = quantized(emb)
    val q = base.where(isQuery)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("codes").as("qcodes"), col("norm2").as("qnorm2"))
    val scored = broadcast(q).join(base, col("q_id") =!= col("vec_id"))
      .withColumn("approx_cos",
        when(col("qnorm2") === 0 || col("norm2") === 0, lit(0.0)).otherwise(
          dotBytes(col("qcodes"), col("codes")).cast("double") /
            (sqrt(col("qnorm2").cast("double")) * sqrt(col("norm2").cast("double")))))
    val wA = Window.partitionBy("q_id")
      .orderBy(col("approx_cos").desc, col("vec_id"))
    val cands = scored
      .withColumn("__ar", row_number().over(wA))
      .where(col("__ar") <= k * refine)
    val exDen = sqrt(dotD(col("qv"), col("qv"))) * sqrt(dotD(col("v"), col("v")))
    val exact = cands.withColumn("cos_sim",
      when(exDen === 0, lit(0.0))
        .otherwise(round(dotD(col("qv"), col("v")) / exDen, 6)))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("rank"), col("cos_sim"))
  }
}
