package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Percentile + cardinality aggregates, exact and sketched.
  *
  * The reference computes summary statistics through its SQL surface
  * (reference: src/pipeline/transformation/sql_transformer.py:49 runs
  * arbitrary aggregates; utils/logging.py records row counts). This
  * module adds the two families every analytics engine needs beyond
  * SUM/AVG, in both an exact form (the correctness baseline) and a
  * sketched form (the 100 TB path):
  *
  *  - `percentiles` — exact `percentile_cont` (linear interpolation).
  *    Exact percentiles buffer every value of a group on one aggregator,
  *    so they are fine per-group but NOT for a 100 TB global percentile.
  *  - `approxPercentiles` — `percentile_approx` (KLL-ish mergeable
  *    sketch): map-side partial sketches merge associatively, so the
  *    full scan parallelises and only fixed-size sketches shuffle.
  *  - `approxDistinct` — `approx_count_distinct` (HyperLogLog++):
  *    exact COUNT(DISTINCT x) shuffles every distinct value; the HLL
  *    sketch ships ~KB per partition regardless of cardinality. At
  *    1000 executors this is the difference between a full-data shuffle
  *    and a metadata-sized merge.
  */
object Sketches {

  /** Exact interpolated percentiles of `valueCol` per group: one output
    * column per requested fraction, named `p50`/`p90`/... Rounded to 6
    * decimals so the result is bit-stable across engines.
    *
    * Computed as a DISTRIBUTED RANK (TeraSort shape), not a per-group
    * sort: a per-group window sort (and equally Spark's `percentile`
    * aggregate, whose boxed-OpenHashMap buffer is worse still) funnels
    * every row of a group through ONE task — the thing that makes an
    * exact 100 TB percentile land on one node. Here instead:
    *
    *  1. range-repartition on (group, value) and sort WITHIN partitions
    *     — each task sorts ~rows/P rows regardless of group sizes;
    *  2. a streaming count of rows per (partition, group) — P x groups
    *     rows reach the driver, giving every partition's global rank
    *     offset and every group's n (hence the exact target ranks
    *     floor/ceil of pos = 1 + p*(n-1));
    *  3. a narrow second pass streams each sorted partition, adds the
    *     broadcast offset to the local index, and emits ONLY the rows
    *     whose global rank is a target — ≤ 2 x fractions rows per
    *     group — which a final tiny aggregate interpolates.
    *
    * Passes 2 and 3 run over the SAME RDD, so the range shuffle is
    * planned once: pass 3 reuses pass 2's shuffle files (a skipped
    * stage) and therefore sees identical partition boundaries — no
    * checkpoint, no re-sample, no second sort.
    *
    * Equal values are interchangeable at equal ranks, so the sampled
    * (deterministically seeded) range boundaries never affect the
    * result. [[approxPercentiles]] remains the one-pass sketch
    * alternative when a rank error of n/accuracy is acceptable.
    *
    * Applicability envelope: the driver holds partitions x groups count
    * tuples and broadcasts a per-group target map, so this form is for
    * ANALYTIC group counts (categories, tenants, days — up to ~10^5
    * groups), where it removes the old per-group one-task funnel. For
    * group cardinalities beyond driver memory (per-user percentiles
    * over millions of users) the group is small and the funnel harmless
    * — use a plain per-group sort/aggregate or [[approxPercentiles]];
    * exact global/large-group percentiles are what THIS form fixes. */
  def percentiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  fractions: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99))
      : DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
    val spark = df.sparkSession
    val gcols = groupCols.map(col)
    val nGroup = groupCols.size
    val base = df
      .select(gcols :+ col(valueCol).cast("double").as("__v"): _*)
      .where(col("__v").isNotNull)
    val parts = spark.sessionState.conf.numShufflePartitions
    // The sorted runs feed TWO passes (count, then extract) off ONE RDD
    // object: the range shuffle's map files are reused across both jobs
    // and only the reduce-side sort re-executes on the second pass.
    // Measured alternative (rejected): persisting the sorted partitions
    // (MEMORY_AND_DISK) to run the sort once REGRESSED sf1 by ~25% (GC
    // churn caching deserialized rows outweighs a 190k-row-per-partition
    // re-sort) and bought <10% at sf10 — and an in-memory mapPartitions
    // sort would trade the SQL sorter's graceful spill for an OOM risk.
    // The repeated sort is the robust shape; it spills, caches don't.
    val sortedRdd = base
      .repartitionByRange(parts, gcols :+ col("__v"): _*)
      .sortWithinPartitions(gcols :+ col("__v"): _*)
      .rdd
    // pass 2: per-(partition, group) counts — group runs are contiguous
    // in the sorted partitions, so a compare-to-previous RUN-LENGTH
    // counter suffices: no per-row key allocation, no per-row hashing.
    // The r18 stage probe caught the old Seq[Any]-keyed LinkedHashMap
    // costing 30 of the query's 53 s at sf10 (body A/B in SCALE.md:
    // seq_linkedmap 39.0 s vs runlength 8.3 s over the same sorted
    // feed); key Seqs are now built once per RUN, not per row.
    val cntRows = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val out = scala.collection.mutable.ArrayBuffer[(Int, Seq[Any], Long)]()
      val cur = new Array[Any](nGroup)
      var n = 0L
      var any = false
      def flush(): Unit = if (any) out += ((pid, cur.toVector, n))
      it.foreach { r =>
        var same = any
        var i = 0
        while (same && i < nGroup) {
          if (r.get(i) != cur(i)) same = false
          i += 1
        }
        if (!same) {
          flush()
          i = 0
          while (i < nGroup) { cur(i) = r.get(i); i += 1 }
          n = 0L
          any = true
        }
        n += 1L
      }
      flush()
      out.iterator
    }.collect()
    val byGroup = cntRows.groupBy(_._2)
    val offsets: Map[(Int, Seq[Any]), Long] = byGroup.flatMap { case (gk, rows) =>
      var acc = 0L
      rows.sortBy(_._1).map { case (pid, _, c) =>
        val start = acc; acc += c; (pid, gk) -> start
      }
    }
    // exact target ranks per group from n; frac is pos - floor(pos)
    val targets: Map[Seq[Any], Map[Long, Seq[(Int, Int, Double)]]] =
      byGroup.map { case (gk, rows) =>
        val n = rows.map(_._3).sum
        val m = scala.collection.mutable.Map[Long, List[(Int, Int, Double)]]()
        fractions.zipWithIndex.foreach { case (p, i) =>
          val pos = 1.0 + p * (n - 1)
          val fl = math.floor(pos).toLong
          val ce = math.ceil(pos).toLong
          val frac = pos - fl
          m(fl) = m.getOrElse(fl, Nil) :+ ((i, 0, frac))
          m(ce) = m.getOrElse(ce, Nil) :+ ((i, 1, frac))
        }
        gk -> m.toMap
      }
    val bc = spark.sparkContext.broadcast((offsets, targets))
    // pass 3: narrow streaming extraction — rank = partition offset +
    // local index within the (contiguous, sorted) group run. Same
    // allocation discipline as pass 2 (r18 probe): the group key is
    // field-compared against a reusable array per row and materialized
    // once per RUN; the per-row boxed rank-map lookup is replaced by a
    // sorted rank array + monotone cursor (idx only grows within a
    // run), so the steady-state row cost is two long compares.
    val exRdd = sortedRdd.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val (offs, tgts) = bc.value
      val cur = new Array[Any](nGroup)
      var curKey: Seq[Any] = null
      var idx = 0L
      var off = 0L
      var rmap: Map[Long, Seq[(Int, Int, Double)]] = Map.empty
      var ranks: Array[Long] = Array.emptyLongArray
      var rpos = 0
      it.flatMap { r =>
        var same = curKey != null
        var i = 0
        while (same && i < nGroup) {
          if (r.get(i) != cur(i)) same = false
          i += 1
        }
        if (!same) {
          i = 0
          while (i < nGroup) { cur(i) = r.get(i); i += 1 }
          curKey = cur.toVector
          idx = 0L
          // passes 2 and 3 must observe the SAME shuffle output: a bare
          // map apply would surface a broken reuse as an opaque
          // NoSuchElementException deep in a task — fail diagnosably
          off = offs.getOrElse((pid, curKey), throw new IllegalStateException(
            s"percentiles rank pass saw unseen partition/group $pid/$curKey — " +
              "sorted-shuffle reuse between count and extract passes is broken"))
          rmap = tgts(curKey)
          ranks = rmap.keysIterator.toArray.sorted
          rpos = 0
        }
        idx += 1
        val rank = off + idx
        while (rpos < ranks.length && ranks(rpos) < rank) rpos += 1
        if (rpos < ranks.length && ranks(rpos) == rank)
          rmap(rank).map { case (i2, role, frac) =>
            // Seq[Any]: a bare Seq(i2, role, frac, v) would infer
            // Seq[Double] and silently widen the Int fields
            Row.fromSeq(curKey ++ Seq[Any](i2, role, frac, r.getDouble(nGroup)))
          }
        else Nil
      }
    }
    val exSchema = StructType(
      groupCols.map(c => base.schema(c)) ++ Seq(
        StructField("__i", IntegerType, nullable = false),
        StructField("__role", IntegerType, nullable = false),
        StructField("__frac", DoubleType, nullable = false),
        StructField("__v", DoubleType, nullable = false)))
    val interp = fractions.zipWithIndex.map { case (p, i) =>
      val lo = max(when(col("__i") === i && col("__role") === 0, col("__v")))
      val hi = max(when(col("__i") === i && col("__role") === 1, col("__v")))
      val frac = first(when(col("__i") === i, col("__frac")), ignoreNulls = true)
      round(lo + frac * (hi - lo), 6).as(pName(p))
    }
    spark.createDataFrame(exRdd, exSchema)
      .groupBy(gcols: _*)
      .agg(interp.head, interp.tail: _*)
      .orderBy(gcols: _*)
  }

  /** Sketched percentiles (mergeable, bounded-memory). `accuracy` is
    * Spark's 1/relative-rank-error knob: 10000 ≈ rank error ≤ 0.01%.
    * Array-form for the same reason as [[percentiles]]: one quantile
    * summary per group, not one per fraction. */
  /** Distributed SQL `percent_rank()` of a BOUNDED value column —
    * (rank−1)/(n−1), ties share a rank — appended as `outCol`, without
    * the single-task global window the naive form costs: deterministic
    * arithmetic buckets over [lo, hi] (equal values always land in the
    * same bucket, so tie groups never straddle a boundary), a
    * per-bucket rank window, and a driver-side exclusive prefix over
    * the buckets-sized count table — the same two-level shape as
    * [[Selection.selectByBudget]] / [[Splits.shufflePositions]].
    * Values outside [lo, hi] must be clamped by the caller (clamping
    * is a semantic choice — e.g. "below −30 avg-logprob is equally
    * garbage" — not a mechanical one). `valueCol` must be non-null:
    * a null has no defensible rank, so the contract is the caller
    * coalesces first (every in-repo caller does) and a violation fails
    * LOUDLY below instead of NPE-ing in the collect or silently
    * dropping the row in the bucket join. (NaN already fails at the
    * ANSI cast of the bucket expression.) */
  def percentRank(df: DataFrame, valueCol: String, outCol: String,
                  lo: Double, hi: Double, buckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(hi > lo, "hi must exceed lo")
    val spark = df.sparkSession
    import spark.implicits._
    val b = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(hi - lo) * buckets), lit(0L)),
      lit(buckets - 1L)).cast("long")
    val base = df.withColumn("__pr_bucket", b)
    val totals = base.groupBy("__pr_bucket").agg(count(lit(1)).as("c"))
      .collect().map { r =>
        if (r.isNullAt(0)) throw new IllegalArgumentException(
          s"percentRank: $valueCol contains ${r.getLong(1)} null value(s) — " +
            "coalesce to an in-range sentinel before ranking")
        r.getLong(0) -> r.getLong(1)
      }.sortBy(_._1)
    val n = totals.map(_._2).sum
    val offsets = totals.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (bk, c)) => (bk, acc + c)
    }.tail.zip(totals).map { case ((bk, end), (_, c)) => (bk, end - c) }
    val w = Window.partitionBy("__pr_bucket").orderBy(col(valueCol))
    base
      .join(broadcast(offsets.toSeq.toDF("__pr_bucket", "__pr_off")), "__pr_bucket")
      .withColumn(outCol,
        if (n <= 1) lit(0.0)
        else round((col("__pr_off") + rank().over(w) - lit(1L)).cast("double") /
          lit((n - 1).toDouble), 6))
      .drop("__pr_bucket", "__pr_off")
  }

  def approxPercentiles(df: DataFrame, valueCol: String,
                        groupCols: Seq[String],
                        fractions: Seq[Double] = Seq(0.5, 0.9, 0.99),
                        accuracy: Int = 10000): DataFrame = {
    val arr = percentile_approx(col(valueCol),
      array(fractions.map(lit): _*), lit(accuracy)).as("__aps")
    val outCols = groupCols.map(col) ++ fractions.zipWithIndex.map {
      case (p, i) => element_at(col("__aps"), i + 1).as("a" + pName(p))
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(arr)
      .select(outCols: _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** HyperLogLog++ distinct counts of each of `countCols` per group.
    * `rsd` = target relative standard deviation (0.01 ≈ 1% error). */
  def approxDistinct(df: DataFrame, countCols: Seq[String],
                     groupCols: Seq[String], rsd: Double = 0.01): DataFrame = {
    val aggs = countCols.map(c =>
      approx_count_distinct(col(c), rsd).as(s"approx_nd_$c"))
    val grouped =
      if (groupCols.isEmpty) df.groupBy()
      else df.groupBy(groupCols.map(col): _*)
    val out = grouped.agg(aggs.head, aggs.tail: _*)
    if (groupCols.isEmpty) out else out.orderBy(groupCols.map(col): _*)
  }

  // ---- mergeable sketch tables (sketch once, merge forever) ----

  /** Build a persistent HLL sketch per group: the returned frame carries
    * a BINARY Apache DataSketches HLL blob per (groupCols) row. This is
    * the "sketch table" pattern for incremental corpus statistics at
    * 100 TB: sketch each day/partition ONCE as data lands, then answer
    * "distinct users over any date range" by merging a handful of
    * KB-sized blobs with [[mergeSketches]] — no rescan of the source,
    * ever. `lgK` trades size for accuracy (12 ≈ 4 KB, ~1.6% error). */
  def distinctSketch(df: DataFrame, countCol: String,
                     groupCols: Seq[String], lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(countCol), lit(lgK)).as(s"sketch_$countCol"))

  /** Merge sketch blobs (produced by [[distinctSketch]]) down to
    * estimates, re-grouped by `groupCols` (pass Nil for a global
    * estimate). Input is the sketch table — typically thousands of rows
    * — so this runs in milliseconds regardless of original data size. */
  def mergeSketches(sketches: DataFrame, sketchCol: String,
                    groupCols: Seq[String]): DataFrame = {
    val merged = hll_sketch_estimate(
      hll_union_agg(col(sketchCol), lit(false))).as("approx_distinct")
    val grouped =
      if (groupCols.isEmpty) sketches.groupBy()
      else sketches.groupBy(groupCols.map(col): _*)
    val out = grouped.agg(merged)
    if (groupCols.isEmpty) out else out.orderBy(groupCols.map(col): _*)
  }

  /** Build a persistent KLL quantile sketch table: one row per
    * (partition, groupCols) carrying a serialized DataSketches
    * KllDoublesSketch blob — the QUANTILE member of the sketch-table
    * family ([[distinctSketch]] is the cardinality member). Sketch each
    * day/partition ONCE as data lands; answer "p99 latency over any
    * date range" later by merging a handful of KB-sized blobs with
    * [[mergeQuantileSketches]] — no rescan, with KLL's a-priori rank
    * error (~1.65% two-sided at k=200, shrinking with k).
    *
    * One typed mapPartitions pass (no shuffle at all — the partial
    * blobs land where the data lives, the table itself is
    * partitions × groups rows); group columns are carried as strings
    * (sketch tables are keyed by partition labels like day/source, and
    * string keys survive parquet round-trips unambiguously). */
  def quantileSketch(df: DataFrame, valueCol: String,
                     groupCols: Seq[String], k: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.datasketches.kll.KllDoublesSketch
    val packed = df.select(
      groupKey(groupCols).as("gk"),
      col(valueCol).cast("double").as("v"))
      .as[(Seq[String], Option[Double])]
    val partials = packed.mapPartitions { it =>
      val sketches = scala.collection.mutable.HashMap
        .empty[Seq[String], KllDoublesSketch]
      it.foreach {
        case (gk, Some(v)) =>
          sketches.getOrElseUpdate(gk,
            KllDoublesSketch.newHeapInstance(k)).update(v)
        case _ => ()
      }
      sketches.iterator.map { case (gk, sk) => (gk, sk.toByteArray) }
    }.toDF("gk", "sketch")
    partials.select(groupCols.zipWithIndex.map { case (n, i) =>
      element_at(col("gk"), i + 1).as(n) }.toSeq :+ col("sketch"): _*)
  }

  /** Merge KLL sketch blobs (from [[quantileSketch]]) down to quantile
    * estimates, re-grouped by `groupCols` (pass Nil for global).
    * Output columns `a<pct>` per requested fraction, rounded to 6 dp.
    * Input is the sketch table — typically thousands of rows — so this
    * runs in milliseconds regardless of original data size. */
  def mergeQuantileSketches(sketches: DataFrame, fractions: Seq[Double],
                            groupCols: Seq[String]): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    import org.apache.datasketches.kll.{KllDoublesSketch => Kll}
    import org.apache.datasketches.memory.Memory
    val fr = fractions
    val keyed = sketches.select(
      groupKey(groupCols).as("gk"),
      col("sketch")).as[(Seq[String], Array[Byte])]
    val merged = keyed.groupByKey(_._1).mapGroups { (gk, rows) =>
      val acc = Kll.newHeapInstance(200)
      rows.foreach { case (_, bytes) =>
        acc.merge(Kll.heapify(Memory.wrap(bytes))) }
      val qs = fr.map(f => if (acc.isEmpty) Double.NaN
        else BigDecimal(acc.getQuantile(f))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (gk, qs)
    }
    val out = merged.toDF("gk", "qs").select(
      groupCols.zipWithIndex.map { case (n, i) =>
        element_at(col("gk"), i + 1).as(n) }.toSeq ++
        fractions.zipWithIndex.map { case (f, i) =>
          element_at(col("qs"), i + 1).as("a" + pName(f)) }: _*)
    if (groupCols.isEmpty) out else out.orderBy(groupCols.map(col): _*)
  }

  /** Sketch-based overlap between two corpus releases — the 100 TB twin
    * of the exact snapshot diff (`Cdc.snapshotDiff`): how much of release
    * B is already in release A, without EVER joining the two.
    *
    * Each side collapses to one KB-sized HLL sketch of its content keys
    * in a single scan (map-side partial sketches merge in the agg);
    * |A∩B| falls out of inclusion-exclusion over three estimates, giving
    * Jaccard + per-side containment. At lgK=14 the per-sketch relative
    * error is ~0.8%, so the intersection estimate's absolute error is
    * bounded by ~0.8% of |A|+|B|+|A∪B| — tight enough for the release
    * questions this answers ("did the new crawl add anything?", "what
    * fraction of the vendor drop is already ours?") at ZERO join cost;
    * when the answer warrants per-doc action, the exact diff runs. The
    * spec certifies the estimates against exact counts at the oracle SF.
    *
    * Output: one row — n_old/n_new/n_union/n_intersect estimates,
    * jaccard, containment_old (|A∩B|/|A|), containment_new. */
  def releaseOverlap(oldDf: DataFrame, newDf: DataFrame, keyCol: Column,
                     lgK: Int = 14): DataFrame = {
    def side(df: DataFrame, name: String) =
      df.select(keyCol.as("k"))
        .agg(hll_sketch_agg(col("k"), lit(lgK)).as("sk"))
        .select(lit(name).as("side"), col("sk"))
    val sketches = side(oldDf, "old").unionByName(side(newDf, "new"))
    sketches.agg(
        max(when(col("side") === "old", hll_sketch_estimate(col("sk")))).as("n_old"),
        max(when(col("side") === "new", hll_sketch_estimate(col("sk")))).as("n_new"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("n_union"))
      .withColumn("n_intersect",
        greatest(lit(0L), col("n_old") + col("n_new") - col("n_union")))
      .withColumn("jaccard", round(col("n_intersect") / col("n_union"), 6))
      .withColumn("containment_old", round(col("n_intersect") / col("n_old"), 6))
      .withColumn("containment_new", round(col("n_intersect") / col("n_new"), 6))
  }

  /** Distributed Misra-Gries heavy hitters with an EXACT-verify second
    * pass — the frequent-items member of the sketch family (HLL for
    * cardinality, KLL for quantiles, MG for top terms).
    *
    * Why not a plain `groupBy(term).count` at 100 TB: a web corpus's
    * term universe is billions of distinct strings, so ranking a top-20
    * exactly shuffles the entire universe. Here each partition streams
    * through a k-counter Misra-Gries summary — amortised O(1) per row:
    * a decrement round only fires when the map is full AND an unseen
    * term arrives, and each round consumes k+1 count units (k decrements
    * + the absorbed new term), so rounds ≤ N/(k+1) and decrement work
    * totals ≤ N — and emits ≤ k (term, floor-count) rows. The one
    * sketch shuffle is partitions × k rows, data-size-independent.
    *
    * MG guarantee: within a partition any term is undercounted by less
    * than n_p/(k+1); summed over partitions the merged summary
    * undercounts any term by < N/(k+1), so every term with true count
    * ≥ N/(k+1) appears in some summary — the candidate set is a proven
    * SUPERSET of all such terms. The second pass counts ONLY candidates
    * exactly (one left-semi join + a candidate-sized group), so when
    * the returned top-K's minimum exact count exceeds N/(k+1), the
    * result is provably the exact top-K — choose k well above
    * N/expected-min-top-count to stay in that regime (the spec asserts
    * it at the oracle SF; at 100 TB, k=2^20 summaries are still
    * MB-sized per partition).
    *
    * `terms` is a one-row-per-occurrence relation; output (term, n, rk)
    * = the exact counts of the top `topK` candidates, ranked by
    * (n DESC, term) for a deterministic, engine-stable order.
    *
    * '''The feed is consumed TWICE''' (sketch pass + exact-count pass),
    * and Catalyst prunes the two consumers into different subtrees, so
    * an expensive lazy feed (tokenize-from-corpus) executes once per
    * pass (r19 sf10 ScanCountProbe: 2 FileScans). Derive the feed by
    * exploding a materialized doc-sized token-array relation (eager
    * `localCheckpoint` — see [[TextAnalysis]]'s ''Materialization
    * barriers'' contract), as the heavy-hitter queries do; never
    * checkpoint the exploded token stream itself. Same contract for
    * [[groupedHeavyHitters]]. */
  def heavyHitters(terms: DataFrame, termCol: String, k: Int = 4096,
                   topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = terms.select(col(termCol).cast("string").as("term"))
    // candidate IDENTITY is all the sketch contributes; counts restart
    // exact, so sketch undercount never reaches the output
    val candidates = mgPartials(t, k).select("term").distinct()
    val exact = t.join(candidates, Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("n"))
    val top = exact.orderBy(col("n").desc, col("term")).limit(topK)
    // rank window runs over topK rows only — the limit above bounds it
    top.withColumn("rk",
      graft.functions.boundedRank(col("n").desc, col("term")).cast("long"))
  }

  /** GROUPED heavy hitters: the per-group form of [[heavyHitters]] —
    * top `topK` terms per group (per-language vocabularies, per-source
    * spam signatures), with the same two-stage shape: per-partition
    * Misra-Gries summaries PER GROUP bound the candidate set
    * (partitions × groups × ≤k rows — never the term universe), then
    * one exact count pass over candidates restores true counts, so MG
    * undercount never reaches the output. Executor memory is
    * groups-on-partition × k counters; the final rank window partitions
    * by group over candidate counts only. Exactness condition per
    * group mirrors the global one (every true top-K term survives some
    * partition's summary — guaranteed when per-partition per-group
    * distinct terms ≤ k, asserted at the oracle SF in its spec). */
  def groupedHeavyHitters(rows: DataFrame, groupCol: String,
                          termCol: String, k: Int = 4096,
                          topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = rows.sparkSession
    import spark.implicits._
    val t = rows.select(col(groupCol).cast("string").as("grp"),
      col(termCol).cast("string").as("term"))
    val partials = t.as[(String, String)].mapPartitions { it =>
      val byGroup = new scala.collection.mutable.HashMap[
        String, scala.collection.mutable.HashMap[String, Long]]()
      it.foreach { case (grp, term) =>
        if (grp != null && term != null) {
          val counts = byGroup.getOrElseUpdate(grp,
            new scala.collection.mutable.HashMap[String, Long]())
          val cur = counts.getOrElse(term, -1L)
          if (cur >= 0L) counts(term) = cur + 1L
          else if (counts.size < k) counts(term) = 1L
          else {
            counts.mapValuesInPlace((_, c) => c - 1L)
            counts.filterInPlace((_, c) => c > 0L)
          }
        }
      }
      byGroup.iterator.flatMap { case (grp, counts) =>
        counts.iterator.map { case (term, c) => (grp, term, c) }
      }
    }.toDF("grp", "term", "c")
    val candidates = partials.select("grp", "term").distinct()
    val exact = t.join(candidates, Seq("grp", "term"), "left_semi")
      .groupBy("grp", "term").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("grp").orderBy(col("n").desc, col("term"))
    exact.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= topK)
      .select(col("grp"), col("term"), col("n"), col("rk"))
  }

  /** Per-partition Misra-Gries k-counter summaries of a (term) stream:
    * <= k (term, floor-count) rows per partition, each term undercounted
    * by less than n_partition/(k+1). The shared partial stage of
    * [[heavyHitters]] (which follows with an exact-verify pass) and the
    * streaming all-history summary ([[mergeHeavyHitterSummaries]],
    * where history is gone and the floor counts ARE the answer). */
  def mgPartials(terms: DataFrame, k: Int): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    terms.select(col("term").cast("string")).as[String].mapPartitions { it =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      it.foreach { term =>
        if (term != null) {
          val cur = counts.getOrElse(term, -1L)
          if (cur >= 0L) counts(term) = cur + 1L
          else if (counts.size < k) counts(term) = 1L
          else {
            counts.mapValuesInPlace((_, c) => c - 1L)
            counts.filterInPlace((_, c) => c > 0L)
          }
        }
      }
      counts.iterator
    }.toDF("term", "c")
  }

  /** Merge Misra-Gries summaries down to one <= k-entry summary — the
    * mergeable-summaries reduction (Agarwal et al.): sum counts per
    * term, then subtract the (k+1)-th largest merged count from every
    * term and drop the non-positive. The result keeps the MG
    * guarantee — any term's floor count undercounts its true count by
    * less than N_total/(k+1) — so summaries built per partition, per
    * batch, or per day compose associatively. All work is
    * summary-sized (<= inputs' total rows, never the data): the rank
    * window and the one-row threshold lookup run over at most a few k
    * rows. */
  def mergeHeavyHitterSummaries(summaries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val summed = summaries.groupBy("term").agg(sum("c").as("c"))
    val ranked = summed.withColumn("rk",
      graft.functions.boundedRank(col("c").desc, col("term")))
    val thresh = ranked.where(col("rk") === k + 1)
      .select(col("c").as("__t"))
    ranked.where(col("rk") <= k).drop("rk")
      .crossJoin(broadcast(thresh.unionByName(
        thresh.sparkSession.range(1).select(lit(0L).as("__t")))
        .orderBy(col("__t").desc).limit(1)))
      .withColumn("c", col("c") - col("__t"))
      .where(col("c") > 0).drop("__t")
  }

  /** Group columns packed as a string array (empty-safe: a typed empty
    * array when there are no group columns — `array()` alone would
    * carry an untyped null element type the tuple encoder rejects). */
  private def groupKey(groupCols: Seq[String]): Column =
    if (groupCols.isEmpty) typedlit(Seq.empty[String])
    else array(groupCols.map(c => col(c).cast("string")): _*)

  private def pName(p: Double): String =
    "p" + BigDecimal(p * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_")
}
