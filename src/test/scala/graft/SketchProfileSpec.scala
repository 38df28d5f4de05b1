package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profiler, Sketches}
import graft.sources.Ingestor

/** Sketched aggregates (error-bounded vs exact) and the column profiler
  * (exact + approx forms agree on everything but the sketched counts). */
class SketchProfileSpec extends SparkSpec {

  private lazy val li = Ingestor.table(spark, sf(), "lineitem")

  test("approx_count_distinct stays within the configured error bound") {
    val exact = li.groupBy("l_returnflag")
      .agg(count_distinct(col("l_orderkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinct(li, Seq("l_orderkey"), Seq("l_returnflag"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, nd) =>
      val rel = math.abs(approx(flag) - nd).toDouble / nd
      assert(rel < 0.05, s"$flag: exact=$nd approx=${approx(flag)} rel=$rel")
    }
  }

  test("Misra-Gries heavy hitters: exact top-K with provable-exactness condition; superset holds at tiny k") {
    import spark.implicits._
    val docs = Ingestor.table(spark, sf(), "documents")
    val terms = docs.select(
      explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        x => x =!= "")).as("term"))
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(20)
      .as[(String, Long)].collect().toSeq
    val got = Sketches.heavyHitters(terms, "term", k = 4096, topK = 20)
      .select("term", "n").as[(String, Long)].collect().toSeq
    assert(got == exact, "candidate+exact-verify must reproduce the exact top-20")
    // provable-exactness regime: min returned count > N/(k+1), so the
    // candidate superset provably contained every top-20 term
    val n = terms.count()
    assert(got.last._2 > n / 4097.0,
      s"oracle SF must sit in the provable regime: min=${got.last._2} N=$n")
    // degraded k: counters far fewer than distinct terms — the MG
    // superset guarantee still recovers every term with count > N/(k+1)
    val tinyK = 64
    val gotTiny = Sketches.heavyHitters(terms, "term", k = tinyK, topK = 20)
      .select("term", "n").as[(String, Long)].collect().toMap
    exact.filter(_._2 > n / (tinyK + 1.0)).foreach { case (t, c) =>
      assert(gotTiny.get(t).contains(c),
        s"guaranteed-heavy term $t (count $c > N/${tinyK + 1}) missing at k=$tinyK")
    }
  }

  test("grouped heavy hitters: exact per-group top-K in the provable regime") {
    import spark.implicits._
    val docs = Ingestor.table(spark, sf(), "documents")
    val terms = docs.select(col("lang"),
      explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        x => x =!= "")).as("term"))
    val got = Sketches.groupedHeavyHitters(terms, "lang", "term",
        k = 4096, topK = 10)
      .select("grp", "term", "n", "rk")
      .as[(String, String, Long, Long)].collect().toSeq.sorted
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("term"))
    val exact = terms.groupBy("lang", "term").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 10)
      .select(col("lang"), col("term"), col("n"), col("rk"))
      .as[(String, String, Long, Long)].collect().toSeq.sorted
    assert(got.nonEmpty && got == exact,
      "per-group candidates + exact verify must reproduce the exact per-group top-10")
    // each group sits in its provable regime: min returned count >
    // n_group/(k+1), so the group's candidate superset provably
    // contained its whole top-10
    val groupN = terms.groupBy("lang").count().as[(String, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.map(_._3).min > groupN(g) / 4097.0, s"group $g outside provable regime")
    }
  }

  test("releaseOverlap estimates track exact overlap within HLL error") {
    import spark.implicits._
    val docs = Ingestor.table(spark, sf(), "documents")
    val oldSnap = docs.where(col("doc_id") % 5 =!= 4)
    val newSnap = docs.where(col("doc_id") % 5 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" [v2]"))).otherwise(col("text")))
    val got = Sketches.releaseOverlap(oldSnap, newSnap, md5(col("text")))
      .collect().head
    val oldKeys = oldSnap.select(md5(col("text"))).distinct()
      .as[String].collect().toSet
    val newKeys = newSnap.select(md5(col("text"))).distinct()
      .as[String].collect().toSet
    val exact = Map(
      "n_old" -> oldKeys.size, "n_new" -> newKeys.size,
      "n_union" -> (oldKeys ++ newKeys).size,
      "n_intersect" -> (oldKeys & newKeys).size)
    // lgK=14 per-sketch rsd ~0.8%; inclusion-exclusion amplifies the
    // intersection's ABSOLUTE error to ~0.8% of the three estimates'
    // sum, so certify against that bound rather than a relative one
    val absBound = 0.03 * (exact("n_old") + exact("n_new") + exact("n_union"))
    exact.foreach { case (k, v) =>
      val est = got.getAs[Long](k)
      assert(math.abs(est - v) <= math.max(absBound, 1.0),
        s"$k: exact=$v est=$est bound=$absBound")
    }
    val jac = got.getAs[Double]("jaccard")
    val exactJac = exact("n_intersect").toDouble / exact("n_union")
    assert(math.abs(jac - exactJac) < 0.05, s"jaccard est=$jac exact=$exactJac")
  }

  test("percentile_approx lands within tight rank error of exact percentiles") {
    val exact = Sketches.percentiles(li, "l_extendedprice", Seq("l_returnflag"),
        fractions = Seq(0.5)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = Sketches.approxPercentiles(li, "l_extendedprice", Seq("l_returnflag"),
        fractions = Seq(0.5)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (flag, p50) =>
      // accuracy=10000 -> rank error <= 0.01%; values near the median move
      // slowly, so 2% relative slack is generous but still meaningful
      val rel = math.abs(approx(flag) - p50) / p50
      assert(rel < 0.02, s"$flag: exact=$p50 approx=${approx(flag)}")
    }
  }

  test("percentiles edge cases: null groups, single-row groups, empty input") {
    import spark.implicits._
    // null group key, a 1-row group, and a 4-row group with duplicates:
    // all target ranks hand-checkable
    val df = Seq(
      (Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 2.0), (Some("a"), 10.0),
      (Some("b"), 5.0),
      (None, 3.0), (None, 4.0)
    ).toDF("g", "v")
    val out = Sketches.percentiles(df, "v", Seq("g"), fractions = Seq(0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    // a: pos = 1 + 0.5*3 = 2.5 -> (2.0 + 2.0)/2; b: single row; null: midpoint
    assert(out == Map(Some("a") -> 2.0, Some("b") -> 5.0, None -> 3.5))
    assert(Sketches.percentiles(df.where(lit(false)), "v", Seq("g")).isEmpty)
  }

  test("approxProfile matches exact profile on everything but sketched distincts") {
    val orders = Ingestor.table(spark, sf(), "orders")
    val exact = Profiler.profile(orders).collect()
    val approx = Profiler.approxProfile(orders).collect()
    assert(exact.length == approx.length)
    exact.zip(approx).foreach { case (e, a) =>
      Seq("column_name", "data_type", "n_rows", "n_nulls", "min_num",
        "max_num", "mean_val", "min_str", "max_str").foreach { f =>
        assert(e.getAs[Any](f) == a.getAs[Any](f), s"field $f differs")
      }
      val (en, an) = (e.getAs[Long]("n_distinct"), a.getAs[Long]("n_distinct"))
      assert(math.abs(an - en).toDouble / math.max(en, 1L) < 0.05,
        s"${e.getAs[String]("column_name")}: exact=$en approx=$an")
    }
  }

  test("sketch table: per-day HLL blobs merge to the global distinct, no rescan") {
    val events = Ingestor.table(spark, sf(), "events")
      .withColumn("day", to_date(col("ts")))
    // build the sketch table once (one row per day, KB-sized blobs)
    val sketchTable = Sketches.distinctSketch(events, "user_id", Seq("day"))
    assert(sketchTable.schema(s"sketch_user_id").dataType.typeName == "binary")
    val nDays = sketchTable.count()
    assert(nDays > 1, "need multiple days to prove merging")
    // merging all day-sketches approximates the true global distinct
    val merged = Sketches.mergeSketches(sketchTable, "sketch_user_id", Nil)
      .collect()(0).getLong(0)
    val exact = events.select(count_distinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
    // and a range query merges a subset of blobs only
    val someDays = sketchTable.limit(3)
    val sub = Sketches.mergeSketches(someDays, "sketch_user_id", Nil)
      .collect()(0).getLong(0)
    assert(sub > 0 && sub <= merged * 1.05)
  }

  test("sketch table: per-day KLL blobs merge to global quantiles within rank error") {
    val events = Ingestor.table(spark, sf(), "events")
      .withColumn("day", to_date(col("ts")))
    val sketchTable = Sketches.quantileSketch(events, "value", Seq("day"))
    assert(sketchTable.schema("sketch").dataType.typeName == "binary")
    assert(sketchTable.count() > 1, "need multiple blobs to prove merging")
    val merged = Sketches.mergeQuantileSketches(sketchTable,
      Seq(0.5, 0.95), Nil).collect()(0)
    // KLL k=200 two-sided rank error ~1.65%; assert the merged
    // estimate's RANK (not value) lands within 3% of the target
    val n = events.where(col("value").isNotNull).count()
    Seq(0.5 -> merged.getDouble(0), 0.95 -> merged.getDouble(1)).foreach {
      case (f, est) =>
        val rank = events.where(col("value") <= est).count().toDouble / n
        assert(math.abs(rank - f) < 0.03, s"p$f est=$est rank=$rank")
    }
    // a per-group merge keyed back on day matches per-day exact medians
    val perDay = Sketches.mergeQuantileSketches(sketchTable, Seq(0.5), Seq("day"))
    assert(perDay.count() == sketchTable.select("day").distinct().count())
  }

  test("IQR outlier fences flag exactly the out-of-fence rows") {
    import spark.implicits._
    // q1 = 2.5, q3 = 4.5 over 1..5 -> iqr 2, fences [-0.5, 7.5]
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0) ++ Seq(100.0, -50.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = graft.operators.Profiler.iqrOutliers(df, "v")
    val flagged = out.where(col("is_outlier")).select("v")
      .as[Double].collect().toSet
    assert(flagged == Set(100.0, -50.0))
    // approx form agrees with exact on this scale
    val approx = graft.operators.Profiler.iqrOutliersApprox(df, "v")
      .where(col("is_outlier")).select("v").as[Double].collect().toSet
    assert(approx == flagged)
  }

  test("label centroids are the per-coordinate means") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 3.0f), 0),
      (2L, Seq(3.0f, 5.0f), 0),
      (3L, Seq(10.0f, 20.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.labelCentroids(emb)
      .orderBy("label", "pos")
      .select("label", "pos", "centroid", "n_vecs")
      .as[(Int, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      (0, 1L, 2.0, 2L), (0, 2L, 4.0, 2L),
      (1, 1L, 10.0, 1L), (1, 2L, 20.0, 1L)))
  }

  test("equal-width histogram covers the range and sums to the row count") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val h = graft.operators.Profiler.histogram(df, "v", bins = 10)
      .select("bucket", "n", "bucket_lo", "bucket_hi")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(h.map(_._2).sum == 100)
    assert(h.map(_._1) == (0L until 10L))
    // v=99 (the max) lands in the last bucket, not an overflow bucket
    assert(h.last._1 == 9L && h.head._3 == 0.0)
    // degenerate range: all values equal -> single bucket 0
    val flat = Seq((1L, 5.0), (2L, 5.0)).toDF("id", "v")
    val hf = graft.operators.Profiler.histogram(flat, "v", bins = 4)
      .select("bucket", "n").as[(Long, Long)].collect().toSeq
    assert(hf == Seq((0L, 2L)))
  }

  test("profiler scan count is fixed, not per-column") {
    val orders = Ingestor.table(spark, sf(), "orders")
    def scans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.LeafNode => r
      }.size
    // exact: wide stats + the multi-distinct aggregate (2 scans for any
    // number of columns); approx: HLL keeps everything in one scan
    assert(scans(Profiler.profile(orders)) == 2)
    assert(scans(Profiler.approxProfile(orders)) == 1)
  }
}
