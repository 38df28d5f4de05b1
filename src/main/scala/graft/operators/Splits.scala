package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splits for training pipelines.
  *
  * Train/val/test assignment must be (a) stable across runs, engines,
  * and partitionings — the same doc lands in the same split forever, or
  * eval sets leak into training; (b) driver-free and shuffle-free. A
  * seeded `randomSplit` fails (a): it is partitioning-dependent. Keyed
  * hashing gives both: the split is a pure projection of the id.
  *
  * Mechanism: the first 8 hex chars of md5(id) are a uniform 32-bit
  * value; cumulative fraction thresholds become hex-string constants and
  * assignment is a string comparison — one codegen'd CASE, no UDF, and
  * byte-identical in any engine with md5 (lowercase-hex comparison IS
  * numeric comparison here). */
object Splits {

  /** Append a `split` column assigning each row to the first label whose
    * cumulative fraction bound covers its hashed id. Fractions must sum
    * to <= 1; any remainder falls to `defaultLabel`. */
  def byHash(df: DataFrame, idCol: String,
             fractions: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1),
             defaultLabel: String = "test"): DataFrame =
    df.withColumn("split", splitExpr(col(idCol), fractions, defaultLabel))

  /** The assignment expression itself, for use inside larger plans. */
  def splitExpr(id: Column, fractions: Seq[(String, Double)],
                defaultLabel: String): Column = {
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val h = substring(md5(id.cast("string")), 1, 8)
    val cums = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val cases = fractions.zip(cums).map { case ((label, _), cum) =>
      (label, thresholdHex(cum))
    }
    cases.foldRight(lit(defaultLabel): Column) { case ((label, th), els) =>
      when(h < lit(th), lit(label)).otherwise(els)
    }
  }

  /** Cumulative fraction -> 8-char lowercase hex bound on [0, 2^32). */
  def thresholdHex(cum: Double): String =
    f"${math.min((cum * 4294967296.0).toLong, 0xFFFFFFFFL)}%08x"

  /** LEAKAGE-SAFE splits — the eval-integrity form of [[byHash]]: a
    * near-duplicate of a test document must never land in train, or the
    * model evals on a near-copy of its own training data, so the unit of
    * assignment is the near-dup CLUSTER, not the document. `pairs` is a
    * verified near-dup pair feed ((a_id, b_id) — [[Dedup.minhashNearDups]]
    * for text, the embedding path for semantic near-dups); components
    * close the pairs transitively, every doc inherits its cluster
    * representative (component min id), and the split hashes the
    * REPRESENTATIVE — an entire near-dup cluster moves between splits as
    * one unit. Singletons hash their own id, so wherever no near-dup
    * exists the assignment is byte-identical to [[byHash]] (the split
    * upgrade never reshuffles the clean bulk of an existing corpus).
    *
    * Scale: the component closure is dup-graph-sized, never corpus-sized
    * (see [[Dedup.connectedComponents]]); the label join-back is the one
    * corpus-sized equi-join; the assignment itself stays a codegen'd
    * projection of the representative id. */
  def leakageSafe(df: DataFrame, pairs: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1),
                  defaultLabel: String = "test",
                  provenRows: Long = graft.functions.autoRows): DataFrame =
    leakageSafeFromLabels(df,
      Dedup.connectedComponents(pairs, df, idCol), idCol, fractions, defaultLabel,
      provenRows)

  /** [[leakageSafe]] over an already-closed label table ((id,
    * cluster_id) — [[Dedup.nearDupClusters]] or its cached form), so a
    * suite whose closure consumers share one cached closure
    * ([[Dedup.nearDupClustersCached]]) doesn't re-close the pair graph
    * per split. Assignment is identical to [[leakageSafe]] over the
    * pair feed that produced the labels. */
  def leakageSafeFromLabels(df: DataFrame, labels: DataFrame, idCol: String,
                            fractions: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1),
                            defaultLabel: String = "test",
                            provenRows: Long = graft.functions.autoRows): DataFrame = {
    val comps = labels.withColumnRenamed("id", idCol)
    // Broadcast-roulette pin (r17 audit): the label table is one
    // (id, cluster_id) row per corpus doc — delta-compressible long
    // pairs whose AQE estimate can undershoot while the deserialized
    // build is heap-sized (the r16 OOM class). The corpus row count
    // bounds it exactly, resolved lazily (caller-provided or a
    // bare-relation count-star only — r17 ADVICE): small raw corpora
    // keep the broadcast, big or unproven ones pin merge.
    df.join(graft.functions.mergePinned(comps,
        graft.functions.resolveRows(df, provenRows)), Seq(idCol))
      .withColumn("split", splitExpr(col("cluster_id"), fractions, defaultLabel))
  }

  /** Deterministic domain-mixture sampling — the "data mixture" step of
    * an LLM training pipeline: given target composition `weights` over a
    * domain column and a total document `budget`, sample each domain at
    * rate min(1, budget * weight / n_domain) so the kept set approaches
    * the target mix. Domains absent from `weights` are dropped.
    *
    * Per-row keep/drop is a pure hash of the id (same mechanism as
    * [[byHash]]: the first 8 hex chars of md5(id) as a uniform 32-bit
    * value), so membership is stable across runs, engines, and
    * partitionings — re-running the mixture never swaps documents in or
    * out of the corpus. Domain counts are one aggregation; the per-domain
    * rates are a handful of rows broadcast back onto the scan, so the
    * whole operator is one small shuffle + one projection at any scale.
    * Rates are computed in fixed double arithmetic (budget * weight /
    * count) to stay bit-identical across engines. */
  /** Cap any one domain's share of the corpus: keep at most `cap` rows
    * per domain, selected by md5-hash order of the id so the kept subset
    * is stable across runs/engines/partitionings (not "first N seen",
    * which is partitioning-dependent). One window shuffle on the domain
    * key; ties cannot occur (the full hash string is unique per id for
    * distinct ids, and id breaks any residual tie). */
  def capPerDomain(df: DataFrame, idCol: String, domainCol: String,
                   cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= cap).drop("__rk")
  }

  /** Curriculum phases: bucket rows into `phases` quality tiers by the
    * score's own quantiles (phase 0 = lowest tier), so a curriculum
    * schedule can feed easy -> hard (or the reverse) without a global
    * sort. One exact-percentile aggregate broadcasts the thresholds
    * back onto the scan; thresholds are rounded to 6dp before the
    * comparison so tier membership is engine-exact. */
  def curriculumPhases(df: DataFrame, scoreCol: String, phases: Int = 3): DataFrame = {
    require(phases >= 2, "phases must be >= 2")
    val fracs = (1 until phases).map(i => i.toDouble / phases)
    val cuts = df.selectExpr(
      s"percentile($scoreCol, array(${fracs.map(_ + "d").mkString(",")})) AS q")
    val thresholds = cuts.select(
      (0 until phases - 1).map(i => round(col("q")(i), 6).as(s"t$i")): _*)
    val phase = (0 until phases - 1).foldLeft(lit(0)) { (acc, i) =>
      acc + when(col(scoreCol) >= col(s"t$i"), 1).otherwise(0)
    }
    df.crossJoin(broadcast(thresholds))
      .withColumn("phase", phase.cast("long"))
      .drop((0 until phases - 1).map(i => s"t$i"): _*)
  }

  /** Deterministic global training-order shuffle: assign every row a
    * unique `shuffle_pos` in md5(seed:id) order — the "shuffle the
    * corpus before sharding" step every training run needs, as a pure
    * function of (seed, id) so the order is reproducible across runs,
    * engines, and partitionings (a seeded `orderBy(rand())` is none of
    * those). Changing the seed is a fresh independent permutation.
    *
    * The global rank is recovered WITHOUT a global sort via the same
    * two-level trick as [[Packing.packSequences]]: the first 2 hex
    * chars of the key are 256 arithmetic buckets whose lexicographic
    * order IS key order, so a within-bucket window + a driver-side
    * exclusive prefix over the 256 bucket counts yields the exact
    * global position — no single-task ordering anywhere. */
  def shufflePositions(df: DataFrame, idCol: String,
                       seed: String = "42"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .withColumn("__key",
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))))
      .withColumn("__bucket", substring(col("__key"), 1, 2))
    val w = Window.partitionBy("__bucket").orderBy(col("__key"), col(idCol))
    val totals = base.groupBy("__bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft(("", 0L)) {
      case ((_, acc), (b, n)) => (b, acc + n)
    }.tail.zip(totals).map { case ((b, end), (_, n)) => (b, end - n) }
    val spark = df.sparkSession
    import spark.implicits._
    base
      .join(broadcast(offsets.toSeq.toDF("__bucket", "__off")), "__bucket")
      .withColumn("shuffle_pos", col("__off") + row_number().over(w).cast("long"))
      .drop("__key", "__bucket", "__off")
  }

  /** Deterministic EXACT-SIZE uniform sample: exactly `n` rows, chosen
    * as the n smallest md5(id ‖ seed) values — membership is a pure
    * function of (id, seed), stable across partitioning, runs, and
    * engines (unlike `df.sample`, which is rate-based, partition-
    * dependent, and only approximately sized). The rate-based twin is
    * [[mixture]]; this is the form a fixed-size eval pool or a
    * human-annotation batch needs.
    *
    * Scale shape: the hash ranking runs on a NARROW (id, hash)
    * projection — a TakeOrdered merge of per-partition top-n, never a
    * global sort and never payload-bearing rows — and the winners join
    * back broadcast, so a 10k-row sample of a 100 TB corpus ships 10k
    * ids plus one column-pruned scan. */
  def sampleExact(df: DataFrame, n: Int, seed: String = "graft",
                  idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val winners = df
      .select(col(idCol),
        md5(concat(col(idCol).cast("string"), lit(seed))).as("__h"))
      .orderBy(col("__h"), col(idCol))
      .limit(n)
      .select(col(idCol))
    df.join(broadcast(winners), Seq(idCol), "left_semi")
  }

  /** Deterministic exact-size WEIGHTED sample without replacement
    * (Efraimidis–Spirakis 2006 "A-ES"): keep the `n` rows with the
    * largest key u_i^(1/w_i), u_i uniform from md5(id‖seed) — the
    * inclusion law of sequential weighted sampling without
    * replacement, with membership a pure function of (id, weight,
    * seed): stable across runs, partitionings, and engines. The
    * quality-weighted eval pool / annotation batch [[sampleExact]]'s
    * uniform law can't express.
    *
    * Keys compare as round(ln(u)/w, 6) — monotone in u^(1/w), and
    * fixing to 6dp keeps libm last-ulp differences from ever flipping
    * an inclusion (ties break to the smaller id). u is (hash+1)/2^32+1
    * so ln(0) can't occur. Non-positive weights are excluded — their
    * inclusion probability is 0 in the limit. Same scale shape as
    * [[sampleExact]]: TakeOrdered over a narrow (id, key) projection +
    * broadcast semi-join back, never a payload sort. */
  def sampleWeighted(df: DataFrame, n: Int, weightCol: String,
                     seed: String = "graft",
                     idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val u = (conv(substring(md5(concat(col(idCol).cast("string"), lit(seed))),
      1, 8), 16, 10).cast("long") + 1) / lit(4294967297.0)
    val winners = df.where(col(weightCol) > 0)
      .select(col(idCol), round(log(u) / col(weightCol), 6).as("__k"))
      .orderBy(col("__k").desc, col(idCol))
      .limit(n)
      .select(col(idCol))
    df.join(broadcast(winners), Seq(idCol), "left_semi")
  }

  def mixture(df: DataFrame, idCol: String, domainCol: String,
              weights: Seq[(String, Double)], budget: Double): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0), "weights must be >= 0")
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.broadcast
    val wdf = spark.createDataFrame(weights).toDF(domainCol, "wt")
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("n_domain"))
    val rates = counts.join(wdf, domainCol)
      .withColumn("rate", least(lit(1.0), lit(budget) * col("wt") / col("n_domain")))
      .select(domainCol, "n_domain", "rate")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
    df.join(broadcast(rates), domainCol)
      .where(u < col("rate"))
  }

  /** Temperature-scaled mixture — [[mixture]] with the target weights
    * DERIVED from the corpus's own composition instead of hand-picked:
    * the multilingual-sampling scheme of mT5/XLM-R (Conneau et al. 2020
    * §3.1; Xue et al. 2021 §3.2), where domain i's target share is
    * q_i = p_i^alpha / sum_j p_j^alpha over the observed shares p_i.
    * alpha=1 reproduces the corpus as-is; alpha=0 flattens to uniform;
    * the published sweet spot (~0.3) upsamples the tail without
    * drowning the head. Per-domain keep rate = min(1, budget*q_i/n_i).
    *
    * Determinism: per-row membership is the same pure md5(id) threshold
    * test as [[mixture]]; the one non-IEEE-portable step is `pow`, whose
    * last-ulp can differ across libm builds, so rates are rounded to 6dp
    * BEFORE the comparison — membership is then a pure function of
    * (id, rounded rate) and engine-exact (a flip would need the hash to
    * land inside the 1e-6 rounding window, ~2^-21 of the key space).
    *
    * Scale: two domain-sized aggregates (counts, then the driver-free
    * normalizer via a broadcast cross join) + one broadcast rate join —
    * document payloads are scanned once and never shuffle. */
  def mixtureTemperature(df: DataFrame, idCol: String, domainCol: String,
                         alpha: Double, budget: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    import org.apache.spark.sql.functions.broadcast
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("n_domain"))
    val total = counts.agg(sum("n_domain").as("n_total"))
    val pa = counts.crossJoin(broadcast(total))
      .withColumn("pa", pow(col("n_domain") / col("n_total"), alpha))
    // decimal-exact normalizer: a double sum over the domain rows would
    // be partition-order-dependent (graft.functions.dec discipline)
    val z = pa.agg(graft.functions.dsum(col("pa")).as("z"))
    val rates = pa.crossJoin(broadcast(z))
      .withColumn("rate",
        round(least(lit(1.0), lit(budget) * (col("pa") / col("z")) / col("n_domain")), 6))
      .select(domainCol, "n_domain", "rate")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)
    df.join(broadcast(rates), domainCol)
      .where(u < col("rate"))
  }

  /** STRATIFIED exact-size sample: exactly `n` rows per group (an eval
    * pool per language, an annotation batch per source) — the grouped
    * form of [[sampleExact]], with the same determinism contract:
    * membership is a pure function of (id, group size permitting, seed),
    * stable across partitioning, runs, and engines. Groups smaller than
    * `n` contribute all their rows.
    *
    * Scale shape: the rank runs on a NARROW (group, id, hash) projection
    * through one window shuffle on the group key — per-group top-n of
    * hashes, never payload-bearing rows — and the winners (groups × n
    * ids) join back broadcast, so payloads ride one column-pruned scan.
    * A skewed group costs the hash sort of ITS ids only, and the sort
    * input can be pre-pruned per partition the day a group outgrows a
    * task (the [[graft.operators.Sketches]] heavy-hitter shape); at
    * eval-pool sizes the window on the narrow projection is already the
    * right plan. */
  def sampleStratified(df: DataFrame, n: Int, groupCol: String,
                       seed: String = "graft",
                       idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.broadcast
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__h"), col(idCol))
    val winners = df
      .select(col(groupCol), col(idCol),
        md5(concat(col(idCol).cast("string"), lit(seed))).as("__h"))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= n)
      .select(col(idCol))
    df.join(broadcast(winners), Seq(idCol), "left_semi")
  }
}
