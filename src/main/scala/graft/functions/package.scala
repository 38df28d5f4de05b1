package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** graft's column-expression library: deterministic aggregates, text
  * shingling, MinHash/SimHash signatures, and vector math — all built
  * from `org.apache.spark.sql.functions` primitives (hash, transform,
  * aggregate, zip_with) so every operator stays inside whole-stage
  * codegen; no UDFs anywhere in a hot path.
  */
package object functions {

  // ---------------------------------------------------------------- decimal
  /** Double aggregation is order-dependent, and Spark's partial (map-side)
    * aggregation sums partitions in nondeterministic order — results would
    * drift run-to-run and never hash-match another engine. Summing exact
    * decimals instead is associative, so the result is identical regardless
    * of partitioning, then cast back to double. */
  def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  /** Exact-decimal SUM, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact-decimal AVG as double: decimal sum first, one double division.
    * (Dividing decimals directly has engine-specific scale rules; dividing
    * two exact numbers in IEEE double does not.) */
  def davg(c: Column): Column = dsum(c) / count(c)

  // ----------------------------------------------------------- parallelism
  /** Spread a frame across the session's parallelism iff it arrives in
    * fewer partitions — the local/small-file case, where a single-row-group
    * parquet file gives the whole downstream CPU-bound pipeline ONE task.
    * At 100 TB the scan already has thousands of splits, so this is a
    * no-op there and never adds a shuffle at scale. */
  def spread(df: org.apache.spark.sql.DataFrame, key: Column): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }

  // -------------------------------------------------- broadcast-roulette pin
  /** Side-row bound under which [[mergePinned]] leaves the join strategy
    * to AQE. The r16 failure class this guards: a join side whose rows
    * COMPRESS far better than they deserialize (sequential longs,
    * template-repetitive arrays) gets a compressed-bytes estimate under
    * the 64 MB broadcast threshold while the deserialized build side is
    * driver-heap-sized — two measured driver OOMs at sf10 (the band
    * self-join and the shard export's doc-level assignment join), both
    * on ~16M-row "small" sides. 512k rows caps the worst-case build at
    * ~100 MB even for ~200 B rows — safe by ARITHMETIC, independent of
    * compression ratio. */
  val pinFreeSideRowLimit: Long = 512L * 1024L

  /** Pin a corpus-scaled join side to sort-merge unless the caller
    * PROVES it tiny: `provenRows` is the side's exact row count (or a
    * trusted upper bound); -1 = unknown = pin. Attach to either side of
    * a join — one merge hint pins the whole join's strategy. Use on any
    * equi-join side that (a) scales with the corpus and (b) carries
    * compression-deceptive rows; leave honest-sized sides (random-hash
    * keys, wide float vectors) and construction-bounded sides
    * (vocabulary, model, benchmark) to AQE. */
  def mergePinned(side: org.apache.spark.sql.DataFrame,
                  provenRows: Long = -1L): org.apache.spark.sql.DataFrame =
    if (provenRows >= 0 && provenRows <= pinFreeSideRowLimit) side
    else side.hint("merge")

  /** Byte bound the row bound above encodes at its documented ~200 B/row:
    * joins whose row width VARIES with a config knob (the band self-join
    * carries the full band array in every exploded row, so width grows
    * 4 B per band) dispatch against this instead of the fixed row limit
    * — at bands=128 a "proven tiny" 512k-row side would deserialize to
    * 3-4x the row bound's worst case, which is exactly the arithmetic
    * the mechanism exists to make safe (r17 ADVICE). */
  val pinFreeSideByteLimit: Long = pinFreeSideRowLimit * 200L

  /** Sentinel for builder `provenRows` parameters: resolve the dispatch
    * count automatically via [[cheapRows]]. Distinct from -1 (= unknown
    * = pin) so callers can still force the conservative plan. */
  val autoRows: Long = Long.MinValue

  /** Row count of `df` when counting is PLAN-CHEAP — the optimized plan
    * is a bare relation (file scan, cached table, local rows), possibly
    * projected — else -1 (= unknown, which [[mergePinned]] pins). Lazy
    * builders resolve their broadcast-vs-merge dispatch numbers through
    * this: on a raw scan the count-star is an empty-schema metadata
    * pass, but on an uncached mid-pipeline transformation chain it
    * would re-execute the whole upstream chain once per BUILD — firing
    * even if the returned frame is never executed (r17 ADVICE). Callers
    * that know their input's exact row count pass it explicitly. */
  def cheapRows(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project}
    def bare(p: LogicalPlan): Boolean = p match {
      case _: LeafNode   => true
      case Project(_, c) => bare(c)
      case _             => false
    }
    if (bare(df.queryExecution.optimizedPlan)) df.count() else -1L
  }

  /** Resolve a builder's `provenRows` parameter: [[autoRows]] (the
    * default) counts only when [[cheapRows]] says the plan makes the
    * count metadata-cheap; any other value is the caller's word. */
  def resolveRows(df: org.apache.spark.sql.DataFrame, provenRows: Long): Long =
    if (provenRows == autoRows) cheapRows(df) else provenRows

  // ------------------------------------------------------------------- text
  /** Lowercase word tokens; the `[^a-z0-9]+` grammar keeps the tokenizer
    * identical across regex engines (Java here, RE2 in oracles). Runs as
    * ONE codegen'd byte scan ([[graft.expressions.WordTokensExpr]]) —
    * the composed `filter(split(lower(c), ...), _ != "")` form is a
    * higher-order `filter` (CodegenFallback, kills whole-stage codegen
    * for the whole corpus scan stage) plus a lowered copy and two array
    * materialisations per document; equivalence is spec-pinned
    * (TokenScanSpec) and oracle-certified by every consumer. */
  def wordTokens(c: Column): Column =
    graft.expressions.TokenExpressions.wordTokens(c)

  /** Distinct word n-gram shingles ("a b c") from a token array. */
  def shingles(tokens: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(tokens) - n),
      i => concat_ws(" ", slice(tokens, i + 1, lit(n))))
    array_distinct(when(size(tokens) >= n, grams).otherwise(array()))
  }

  /** Whitespace token count (as BIGINT for oracle parity). Trim-first
    * instead of filtering empties with a lambda: higher-order functions
    * are CodegenFallback and would break whole-stage codegen in the text
    * hot path (split/size/trim all codegen). */
  def wsTokenCount(c: Column): Column = {
    val trimmed = trim(c)
    when(length(trimmed) === 0, lit(0L))
      .otherwise(size(split(trimmed, "\\s+")).cast("long"))
  }

  // ---------------------------------------------------------------- windows
  /** Global `row_number` over a BOUNDED relation — top-K candidate
    * tables after a `limit`, vocabularies, domain tables: relations a
    * prior step already reduced to driver-ish size. One helper so
    * every deliberate single-partition rank is findable and carries
    * this contract: callers must only pass relations bounded upstream.
    *
    * The literal partition key documents intent but does NOT survive
    * optimization — Catalyst constant-folds foldable partition
    * expressions away, so the executed WindowExec is unpartitioned
    * either way (measured: a plan scan over all 156 suite queries
    * shows the only empty-partitionSpec windows are these deliberate
    * bounded ones). The bench harness therefore demotes exactly the
    * WindowExec logger instead of pretending the literal silences it;
    * library sessions keep the WARN for accidental global windows. */
  def boundedRank(order: Column*): Column =
    row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(order: _*))

  // ------------------------------------------------------------------- skew
  /** Salt for skewed aggregation keys: split each hot key across
    * `buckets` sub-keys, aggregate partially on (key, salt), then
    * aggregate the partials on key alone. AQE's skew-join splitting
    * handles joins; this is the groupBy-side equivalent for when one key
    * holds a double-digit share of 100 TB. Deterministic per row via
    * hashing `row` (a unique-ish column), not rand(), so retried tasks
    * salt identically and results stay reproducible. */
  def saltKey(row: Column, buckets: Int): Column = pmod(hash(row), lit(buckets))

  // ---------------------------------------------------------------- minhash
  /** Base 31-bit hash per shingle; computed once, then k affine re-hashes
    * derive the signature (standard universal-hashing MinHash — one pass
    * over the shingles instead of k). 31-bit base × 31-bit coefficients
    * keeps every product under 2^62: no long overflow, so the expression
    * is legal under Spark 4's default ANSI mode. */
  def minhashBase(shingleArr: Column): Column =
    transform(shingleArr, s => xxhash64(s).bitwiseAND(lit(0x7FFFFFFFL)))

  /** Deterministic affine coefficients (a odd in [1,2^31), b in [0,2^31))
    * for the k MinHash permutations. */
  def minhashCoeffs(k: Int, seed: Long = 0x5eedL): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k)((
      (rnd.nextInt(Int.MaxValue - 1).toLong + 1L) | 1L,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** k-element MinHash signature from the base-hash array. The modulus
    * is essential, not decorative: without it `a*h + b` (a > 0) is
    * monotonic in h, so every "permutation" would pick the same argmin
    * element and the k hashes collapse into one. Reducing mod a prime
    * (2^31 - 1, Mersenne) makes each (a,b) a genuinely different
    * permutation of the hash space. */
  val minhashPrime = 2147483647L

  def minhashSignature(base: Column, k: Int): Column = {
    val sig = minhashCoeffs(k).map { case (a, b) =>
      array_min(transform(base, h => pmod(h * lit(a) + lit(b), lit(minhashPrime))))
    }
    array(sig.toIndexedSeq: _*)
  }

  /** Probability that a pair at Jaccard similarity `s` becomes an LSH
    * candidate under (bands b, rows-per-band r): 1 − (1 − s^r)^b — the
    * textbook S-curve (Leskovec/Rajaraman/Ullman, MMDS ch. 3). */
  def lshCandidateProb(s: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

  /** Pick (bands, rowsPerBand) for a `k`-hash MinHash signature so a
    * pair at `threshold` similarity is caught with probability at least
    * `targetRecall`, using as MANY rows per band as possible — more
    * rows per band = a steeper S-curve = fewer below-threshold false
    * candidates, and the false-candidate volume is what a 100 TB
    * banding job pays for (every candidate is an exact-verify row).
    * Deterministic; fails loudly when k is too small for the ask
    * rather than silently returning a laxer curve. Returns
    * (bands, rowsPerBand, catchProbAtThreshold). */
  def lshPlan(k: Int, threshold: Double, targetRecall: Double = 0.95)
      : (Int, Int, Double) = {
    require(k >= 1 && threshold > 0 && threshold <= 1 &&
      targetRecall > 0 && targetRecall < 1)
    val options = (1 to k).filter(k % _ == 0).reverse // rowsPerBand, steep first
      .map(r => (k / r, r, lshCandidateProb(threshold, k / r, r)))
    options.find(_._3 >= targetRecall).getOrElse(sys.error(
      f"lshPlan: k=$k cannot reach recall $targetRecall%.2f at threshold " +
        f"$threshold%.2f (best ${options.map(_._3).max}%.3f with 1-row bands) — raise k"))
  }

  /** LSH band keys: the signature is cut into `bands` rows of
    * `rowsPerBand`, each band hashed to one bucket key. Documents sharing
    * any band bucket become candidate pairs — this is what turns O(n^2)
    * all-pairs comparison into per-bucket joins at 100 TB. */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    val keys = (0 until bands).map { b =>
      hash(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))
    }
    array(keys: _*)
  }

  /** 63-bit SimHash over a token/shingle hash array: per-bit majority vote
    * of the element hashes, folded to a single long. 63 bits (not 64) so
    * the fold never overflows a signed long — ANSI-mode safe. Pure SQL
    * higher-order functions (the `expr` form is needed because
    * `shiftright`'s Scala binding only takes literal shift amounts). */
  def simhash64(baseHashCol: String): Column = expr(
    s"""aggregate(sequence(62, 0, -1), 0L, (acc, b) -> acc * 2L +
       |  (CASE WHEN aggregate($baseHashCol, 0,
       |     (a, h) -> a + (CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END)) >= 0
       |   THEN 1L ELSE 0L END))""".stripMargin)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---------------------------------------------------------------- vectors
  /** Cast a float vector to double (all math in double for cross-engine
    * reproducibility). Plain Cast, not a transform() lambda — Cast is
    * codegen'd, higher-order functions are not. */
  def vecD(c: Column): Column = c.cast("array<double>")

  /** Dot product as a custom codegen'd Catalyst expression
    * ([[graft.expressions.DoubleDotProduct]]): a tight primitive loop in
    * generated code, sequential left-to-right accumulation — bit-identical
    * to any engine's simple loop, ~50x faster than the interpreted
    * aggregate(zip_with(...)) HOF chain it replaces. */
  def dotProduct(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotD(a, b)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity with precomputed norms (norms are computed once per
    * row before any join, not once per pair). */
  def cosineWithNorms(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)
}
