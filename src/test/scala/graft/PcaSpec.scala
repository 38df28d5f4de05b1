package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** Distributed-PCA certification (the `emb_pca` entry is rows-only in
  * the oracle gate — this suite is its correctness evidence):
  * orthonormality of the returned basis, variance accounting against
  * the covariance trace, reconstruction on planted low-rank data,
  * partitioning-invariance of the pinned-sign components, and the
  * Jacobi kernel against a hand-solvable matrix. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Planted rank-2 data in 6 dims: points on a 2-plane spanned by two
    * orthogonal directions plus a deterministic offset — no noise, so
    * k=2 must account for ~all variance and reconstruct exactly. */
  private def planted(n: Int = 400) = {
    val d1 = Array(1.0, 1.0, 0.0, 0.0, 1.0, 0.0).map(_ / math.sqrt(3.0))
    val d2 = Array(0.0, 0.0, 1.0, -1.0, 0.0, 1.0).map(_ / math.sqrt(3.0))
    val off = Array(5.0, -2.0, 0.5, 0.0, 3.0, 1.0)
    (0 until n).map { i =>
      val a = math.sin(i * 0.37) * 4.0
      val b = math.cos(i * 0.53) * 1.5
      (i.toLong, Array.tabulate(6)(j => (off(j) + a * d1(j) + b * d2(j)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("components are orthonormal; eigenvalues account for the trace") {
    val m = Pca.fit(planted(), k = 6)
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"components $i.$j dot $dot")
    }
    // k = dim: the eigenvalue sum IS the covariance trace
    assert(math.abs(m.eigenvalues.sum - m.totalVariance) < 1e-6 * m.totalVariance)
    // variance-descending order, rank 2 by construction
    assert(m.eigenvalues.sliding(2).forall { case Array(a, b) => a >= b - 1e-12 })
    assert(m.explainedVariance.take(2).sum > 0.999999)
    assert(m.eigenvalues.drop(2).forall(_ < 1e-8 * m.totalVariance))
  }

  test("k=2 reconstruction recovers planted rank-2 vectors") {
    val df = planted()
    val m = Pca.fit(df, k = 2)
    val rows = Pca.transform(df, m)
      .select(col("embedding").cast("array<double>"), col("pc1"), col("pc2"))
      .as[(Array[Double], Double, Double)].collect()
    rows.foreach { case (x, p1, p2) =>
      val rec = Array.tabulate(6)(j =>
        m.mean(j) + p1 * m.components(0)(j) + p2 * m.components(1)(j))
      val err = math.sqrt(x.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(err < 1e-6, s"reconstruction error $err")
    }
  }

  test("pinned component signs make the model partitioning-invariant") {
    // k = 2 only: the rank-2 data's remaining eigenvectors span a
    // null space where direction is genuinely arbitrary — invariance
    // is a meaningful claim only for well-separated eigenvalues
    val df = planted()
    val m1 = Pca.fit(df.repartition(1), k = 2)
    val m7 = Pca.fit(df.repartition(7, col("vec_id")), k = 2)
    // tolerance: double accumulation order differs across partitionings
    // (that is WHY the sign is pinned — only the sign must be exact)
    m1.components.zip(m7.components).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-7) }
    }
    m1.eigenvalues.zip(m7.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-7 * math.max(1.0, m1.totalVariance))
    }
  }

  test("jacobi kernel solves a known symmetric system") {
    // [[2,1],[1,2]] has eigenpairs 3 -> (1,1)/√2 and 1 -> (1,-1)/√2
    val (values, vectors) = Pca.jacobiEigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = values.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    val hi = values.indexOf(values.max)
    val v = Array(vectors(0)(hi), vectors(1)(hi))
    assert(math.abs(math.abs(v(0)) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(v(0) - v(1)) < 1e-12) // same-sign pair for eigenvalue 3
  }

  test("transform projection matches driver-side centered dot products") {
    val df = planted(50)
    val m = Pca.fit(df, k = 2)
    val got = Pca.transform(df, m)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("pc1"), col("pc2"))
      .as[(Long, Array[Double], Double, Double)].collect()
    got.foreach { case (_, x, p1, p2) =>
      val c = x.zip(m.mean).map { case (a, b) => a - b }
      val e1 = c.zip(m.components(0)).map { case (a, b) => a * b }.sum
      val e2 = c.zip(m.components(1)).map { case (a, b) => a * b }.sum
      assert(math.abs(p1 - e1) < 1e-9 && math.abs(p2 - e2) < 1e-9)
    }
  }
}
