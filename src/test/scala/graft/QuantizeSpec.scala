package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quantize, Similarity}

/** Int8 quantization certification: the constructive error bound, the
  * byte-dot kernel against hand arithmetic, cosine fidelity on real
  * test embeddings, knnQuantized recall vs exact brute force (with
  * survivor similarities bit-equal to knnBrute's), and partitioning
  * invariance. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(sf() + "/embeddings.parquet")

  test("round-trip error within scale/2 per component; zero vector safe") {
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 1.0f)),
      (2L, Array(-3.0f, 2.0f, 0.0f, 0.004f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val a = Quantize.audit(vecs).orderBy("vec_id")
      .select("vec_id", "scale", "max_abs_err", "err_bound", "cos_q")
      .as[(Long, Double, Double, Double, Double)].collect()
    a.foreach { case (id, scale, err, bound, cosQ) =>
      assert(err <= bound + 1e-9, s"vec $id err $err > bound $bound")
      assert(cosQ > 0.99, s"vec $id cos_q $cosQ")
    }
    val zero = a.find(_._1 == 3L).get
    assert(zero._2 == 1.0 && zero._3 == 0.0 && zero._5 == 1.0)
  }

  test("byte dot kernel matches hand arithmetic through codegen") {
    val df = Seq((1L, Array(1.0f, -1.0f, 0.5f), Array(1.0f, 1.0f, 0.5f)))
      .toDF("id", "a", "b")
    import graft.expressions.VectorExpressions._
    import graft.functions.vecD
    val out = df.select(
      quantizeVec(vecD(col("a"))).getField("codes").as("qa"),
      quantizeVec(vecD(col("b"))).getField("codes").as("qb"))
      .select(dotBytes(col("qa"), col("qb")).as("d"),
        dotBytes(col("qa"), col("qa")).as("na"))
      .as[(Long, Long)].head()
    // a -> scale 1/127: codes (127, -127, 64); b -> (127, 127, 64)
    assert(out._1 == 127L * 127 - 127L * 127 + 64L * 64)
    assert(out._2 == 127L * 127 + 127L * 127 + 64L * 64)
  }

  test("cosine fidelity on the real test embeddings") {
    val a = Quantize.audit(emb)
    val worst = a.agg(min("cos_q"), max(col("max_abs_err") - col("err_bound")))
      .as[(Double, Double)].head()
    assert(worst._1 > 0.995, s"worst quantized cosine ${worst._1}")
    assert(worst._2 <= 1e-9, "error bound violated somewhere")
  }

  test("knnQuantized: high recall vs brute, exact sims on survivors, invariant") {
    val isQ = col("vec_id") < 10
    val exact = Similarity.knnBrute(emb, isQ, k = 10)
      .select("q_id", "n_id", "cos_sim").as[(Long, Long, Double)].collect()
    val quant = Quantize.knnQuantized(emb, isQ, k = 10, refine = 4)
      .select("q_id", "n_id", "cos_sim").as[(Long, Long, Double)].collect()
    val eSet = exact.map(r => (r._1, r._2)).toSet
    val qSet = quant.map(r => (r._1, r._2)).toSet
    val recall = eSet.count(qSet) / eSet.size.toDouble
    assert(recall >= 0.9, s"recall@10 $recall")
    // where both agree on the neighbour, the similarity is the same
    // EXACT double cosine (stage 2 re-ranks with float vectors)
    val eMap = exact.map(r => (r._1, r._2) -> r._3).toMap
    quant.foreach { case (q, n, c) =>
      eMap.get((q, n)).foreach(ec => assert(ec == c, s"($q,$n): $ec vs $c"))
    }
    val again = Quantize.knnQuantized(
        emb.repartition(7, col("vec_id")), isQ, k = 10, refine = 4)
      .select("q_id", "n_id", "cos_sim").as[(Long, Long, Double)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq ==
      quant.sortBy(r => (r._1, r._2)).toSeq)
  }
}
