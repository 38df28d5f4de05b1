package graft

/** Single-thread microbench of the blocked centroid-dot kernel —
  * establishes the arithmetic floor for the Lloyd/assignment passes.
  * Run with `Test/runMain graft.DotBench [rows] [k] [dim]`. */
object DotBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 20000
    val k = if (args.length > 1) args(1).toInt else 1788
    val dim = if (args.length > 2) args(2).toInt else 64
    val rnd = new scala.util.Random(1)
    val cents = Array.fill(k)(Array.fill(dim)(rnd.nextGaussian()))
    val vs = Array.fill(256)(Array.fill(dim)(rnd.nextGaussian()))
    val dots = new Array[Double](k)
    var sink = 0.0
    // warmup
    var w = 0
    while (w < 2000) {
      graft.operators.Similarity.dotsBlocked(vs(w % 256), cents, dots)
      sink += dots(0); w += 1
    }
    val t0 = System.nanoTime()
    var i = 0
    while (i < rows) {
      graft.operators.Similarity.dotsBlocked(vs(i % 256), cents, dots)
      sink += dots(k - 1)
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val gma = rows.toDouble * k * dim / 1e9
    println(f"DOTBENCH rows=$rows k=$k dim=$dim  $sec%.2f s  ${gma / sec}%.2f G mult-add/s/thread  sink=$sink%.1f")
  }
}
