package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions.dotD
import graft.functions.vecD

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction step a 100 TB vector corpus runs before indexing (OPQ-style
  * rotation, storage compression, or a cheaper ANN distance). Covariance
  * is accumulated as ONE dim x dim matrix per task via `treeAggregate`
  * (for dim=64 that is 32 KB per partition — model-sized, never
  * corpus-sized), the eigendecomposition runs on the driver's dim x dim
  * matrix (O(dim^3), microseconds), and the projection back over the
  * corpus is a map-side chain of [[graft.expressions.DoubleDotProduct]]
  * dot products against broadcast literal component vectors — whole-
  * stage codegen, no shuffle, no UDF. The same three-phase shape as
  * [[Similarity.trainIvfCentroids]]: corpus-sized work stays
  * distributed, only model-sized matrices visit the driver.
  */
object Pca {

  /** Trained model: `mean` (dim), `components` (k rows, each dim,
    * orthonormal, variance-descending), `eigenvalues` (k, the projected
    * variance along each component), `totalVariance` (trace of the
    * covariance — the denominator of explained-variance ratios). */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
                      eigenvalues: Array[Double], totalVariance: Double) {
    def explainedVariance: Array[Double] =
      eigenvalues.map(e => if (totalVariance == 0) 0.0 else e / totalVariance)
  }

  /** Fit a k-component PCA. One distributed pass accumulates n, the
    * coordinate sums, and the raw second-moment matrix X'X (upper
    * triangle only — it is symmetric); covariance = E[xx'] - mm' on the
    * driver; eigenpairs from cyclic Jacobi (self-contained — no linalg
    * dependency, exact enough at dim<=a few hundred, and symmetric
    * Jacobi is unconditionally stable). Component sign is normalized so
    * the largest-|coordinate| entry is positive — eigenvectors are
    * sign-ambiguous and an unpinned sign would make every downstream
    * artifact run-dependent. */
  def fit(emb: DataFrame, k: Int, vecCol: String = "embedding"): PcaModel = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(vecD(col(vecCol)).as("v")).where(col("v").isNotNull)
      .as[Array[Double]]
    val dim = vecs.head().length
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")
    // acc layout: [n, sum(dim), upper-triangle of X'X (dim*(dim+1)/2)]
    val triN = dim * (dim + 1) / 2
    val acc = vecs.rdd.treeAggregate(new Array[Double](1 + dim + triN))(
      seqOp = (a, x) => {
        a(0) += 1.0
        var i = 0
        while (i < dim) {
          a(1 + i) += x(i)
          var j = i
          // row-major upper triangle: entry (i,j>=i) at offset
          // i*dim - i*(i-1)/2 + (j-i)
          val base = 1 + dim + i * dim - i * (i - 1) / 2 - i
          while (j < dim) { a(base + j) += x(i) * x(j); j += 1 }
          i += 1
        }
        a
      },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
    val n = acc(0)
    require(n > 1, "PCA needs at least 2 vectors")
    val mean = Array.tabulate(dim)(i => acc(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      val base = 1 + dim + i * dim - i * (i - 1) / 2 - i
      var j = i
      while (j < dim) {
        val c = acc(base + j) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigSym(cov)
    val order = values.indices.sortBy(ix => -values(ix)).take(k)
    val comps = order.map { ix =>
      val v = vectors.map(_(ix))
      val pivot = v.indices.maxBy(d => (math.abs(v(d)), -d))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(mean, comps, order.map(ix => math.max(0.0, values(ix))).toArray,
      values.map(v => math.max(0.0, v)).sum)
  }

  /** Project the corpus onto the model's components: adds pc1..pck.
    * (x - mean) . w = x . w - mean . w, so each coordinate is one
    * codegen'd dot product against a broadcast literal vector plus a
    * constant — the corpus never re-centers and never shuffles. */
  def transform(emb: DataFrame, model: PcaModel,
                vecCol: String = "embedding"): DataFrame = {
    val v = vecD(col(vecCol))
    model.components.zipWithIndex.foldLeft(emb) { case (df, (w, ix)) =>
      val shift = w.zip(model.mean).map { case (a, b) => a * b }.sum
      df.withColumn(s"pc${ix + 1}", dotD(v, typedLit(w.toSeq)) - lit(shift))
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with vectors in COLUMNS, same
    * index order as the values). Converges quadratically; 64x64
    * covariance matrices need a handful of sweeps. */
  private[graft] def jacobiEigSym(m: Array[Array[Double]],
                                      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val dim = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1.0, a.indices.map(i => math.abs(a(i)(i))).max)
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          if (math.abs(a(p)(q)) > tol * 1e-2) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // smaller-magnitude root of t^2 + 2*theta*t - 1 = 0
            val t = if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < dim) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < dim) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(dim)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
