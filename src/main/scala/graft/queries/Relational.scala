package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Ingestor

/** SURVEY §2.1 relational/query-engine core.
  *
  * The reference executes these shapes through its SQLTransformer
  * (reference: src/pipeline/transformation/sql_transformer.py:49) —
  * arbitrary SQL over a staged DataFrame. Here each query is a declarative
  * DataFrame plan, so Catalyst performs pushdown / pruning / join
  * selection, and each carries a DuckDB oracle for the correctness gate.
  *
  * Float determinism: every SUM/AVG of a double column goes through
  * [[graft.functions.dsum]]/[[davg]] (exact decimal accumulate, double
  * result) so values are partitioning-independent and hash-match DuckDB.
  * Every computed integer is cast to BIGINT to match DuckDB's wider types.
  * Every query ends in a deterministic ORDER BY.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Ingestor.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q3_shipping_priority" -> ((s, d) => {
      // Dim-side (filtered customer) broadcasts; lineitem never shuffles
      // for the join, only for the final aggregation.
      val cust = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders").where(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li = t(s, d, "lineitem").where(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    "q5_local_supplier" -> ((s, d) => {
      val region = t(s, d, "region").where(col("r_name") === "ASIA")
      val ord = t(s, d, "orders").where(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      t(s, d, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q_filter_ops" -> ((s, d) => {
      t(s, d, "part")
        .where(col("p_size") > 10 && col("p_size") <= 40 &&
          col("p_retailprice") >= 920.0 && col("p_retailprice") < 980.0 &&
          col("p_brand") =!= "Brand#5" &&
          col("p_type").isin("ECONOMY", "SMALL", "PROMO") &&
          !col("p_brand").isin("Brand#11", "Brand#12") &&
          col("p_name").contains("gear") &&
          col("p_name").isNotNull)
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .orderBy("p_partkey")
    }),

    "q_agg_funcs" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_custs"),
          dsum(col("o_totalprice")).as("sum_price"),
          davg(col("o_totalprice")).as("avg_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"))
        .orderBy("o_orderpriority")
    }),

    "q_global_agg" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        dsum(col("l_quantity")).as("sum_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
    }),

    // correlation statistics via explicit co-moments over decimal-exact
    // sums: Spark's corr()/covar_pop() accumulate doubles in partition
    // order (nondeterministic run to run); the textbook formulas over
    // associative decimal sums are bit-reproducible on any engine
    "q_corr" -> ((s, d) => {
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          dsum(x).as("sx"), dsum(y).as("sy"),
          dsum(x * x).as("sxx"), dsum(y * y).as("syy"), dsum(x * y).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_xy"),
          round((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"), 6).as("covar_pop"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"))
        .orderBy("l_returnflag")
    }),

    "q_histogram" -> ((s, d) =>
      graft.operators.Profiler.histogram(t(s, d, "orders"), "o_totalprice", bins = 20)),

    // capacity-review skew report: who are the heavy keys, and how heavy
    "q_skew_report" -> ((s, d) =>
      graft.operators.Skew.report(t(s, d, "orders"), "o_custkey", topK = 20)
        .orderBy("rk")),

    "q_semi_join" -> ((s, d) => {
      val ord2k = t(s, d, "orders").where(
        col("o_orderdate") >= lit("2000-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("2001-01-01").cast("timestamp"))
      t(s, d, "customer")
        .join(ord2k, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "q_anti_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    "q_window_running" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .where(col("o_custkey") < 200)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
          row_number().over(w).cast("long").as("order_seq"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          rank().over(Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .cast("long").as("price_rank"))
        .orderBy("o_custkey", "order_seq")
    }),

    "q_topn_per_group" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("rn").cast("long").as("rn"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    "q_distinct_custs" -> ((s, d) => {
      t(s, d, "orders")
        .select("o_custkey", "o_orderstatus").distinct()
        .orderBy("o_custkey", "o_orderstatus")
    }),

    "q_set_ops" -> ((s, d) => {
      val big = t(s, d, "orders").where(col("o_totalprice") > 400000.0)
        .select("o_custkey").distinct()
      val building = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey"))
      big.intersect(building).withColumn("op", lit("both"))
        .unionByName(big.except(building).withColumn("op", lit("big_only")))
        .unionByName(big.union(building).distinct().withColumn("op", lit("either")))
        .select(col("op"), col("o_custkey").as("custkey"))
        .orderBy("op", "custkey")
    }),

    // Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL keep duplicate
    // multiplicities (min / difference of counts per value) — a
    // different operator than the DISTINCT forms above.
    "q_set_ops_all" -> ((s, d) => {
      val a = t(s, d, "orders").where(col("o_totalprice") > 300000.0)
        .select("o_custkey")
      val b = t(s, d, "orders").where(col("o_orderstatus") === "O")
        .select("o_custkey")
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .unionByName(a.exceptAll(b).withColumn("op", lit("except_all")))
        .select(col("op"), col("o_custkey").as("custkey"))
        .orderBy("op", "custkey")
    }),

    // True correlated scalar subquery (not EXISTS): each order compared
    // to ITS customer's average spend — Catalyst rewrites the subquery
    // to an aggregated self-join under the hood.
    "q_scalar_subquery" -> ((s, d) => {
      Seq("orders").foreach(n => t(s, d, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
          |FROM orders o
          |WHERE o.o_totalprice > 1.5 * (
          |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
          |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o.o_orderkey""".stripMargin)
    }),

    "q_conditional_pivot" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          dsum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(lit(0.0))).as("open_total"),
          dsum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0))).as("filled_total"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("pending_cnt"))
        .orderBy("o_orderpriority")
    }),

    // Analytic window depth: distribution functions (percent_rank,
    // cume_dist), quantile bucketing (ntile), navigation (lead,
    // first_value) over one ordered window — all computed in a single
    // WindowExec pass after one hash shuffle on the partition key.
    "q_window_analytics" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .where(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          first_value(col("o_totalprice")).over(w).as("cheapest"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy("o_orderkey")
    }),

    // Native RelationalGroupedDataset.pivot with explicit value list: the
    // list keeps the plan static (no extra distinct-values job) and the
    // pivot compiles to the same conditional-aggregate shape as above.
    "q_pivot" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(dsum(col("o_totalprice")))
        .select(col("o_orderpriority"),
          coalesce(col("O"), lit(0.0)).as("o_total"),
          coalesce(col("F"), lit(0.0)).as("f_total"),
          coalesce(col("P"), lit(0.0)).as("p_total"))
        .orderBy("o_orderpriority")
    }),

    // Native unpivot/melt: wide per-row measures to long (measure, value)
    // pairs — a projection + generator, no shuffle.
    "q_unpivot" -> ((s, d) => {
      t(s, d, "lineitem")
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    }),

    "q_rollup" -> ((s, d) => {
      t(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    "q_string_funcs" -> ((s, d) => {
      t(s, d, "part")
        .where(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_brand")).as("brand_lower"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
          length(col("p_name")).cast("long").as("name_len"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"))
        .orderBy("p_partkey")
    }),

    "q_date_funcs" -> ((s, d) => {
      t(s, d, "orders")
        .where(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"), col("o_orderdate"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          (dayofweek(col("o_orderdate"))).cast("long").as("dow"),
          // computed timestamps stay NTZ (naive): date_trunc promotes its
          // DATE input to a session-TZ (LTZ) timestamp, which would
          // round-trip through parquet as an instant-semantics column — a
          // different type than every other engine's naive TIMESTAMP for
          // the same expression
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
          datediff(lit("2000-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to_y2k"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).cast("timestamp_ntz").as("plus_30d"))
        .orderBy("o_orderkey")
    }),

    // Correlated EXISTS + scalar subquery: expressed through Spark SQL
    // (the engine's SqlTransform surface) — Catalyst rewrites the EXISTS
    // to a semi join and the scalar subquery to a broadcast single-row plan.
    "q_exists_subquery" -> ((s, d) => {
      Seq("customer", "orders").foreach(n => t(s, d, n).createOrReplaceTempView(n))
      s.sql(
        """SELECT c.c_custkey, c.c_name, c.c_acctbal
          |FROM customer c
          |WHERE EXISTS (
          |  SELECT 1 FROM orders o
          |  WHERE o.o_custkey = c.c_custkey
          |    AND o.o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
          |                                 / COUNT(*) * 3.0 FROM orders))
          |ORDER BY c.c_custkey""".stripMargin)
    }),

    "q_having" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .where(col("n_orders") >= 15)
        .orderBy("o_custkey")
    }),

    "q_outer_join" -> ((s, d) => {
      val big = t(s, d, "orders").where(col("o_totalprice") > 300000.0)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_big_orders"))
      val rich = t(s, d, "customer").where(col("c_acctbal") > 8000.0)
        .select(col("c_custkey").as("custkey"), col("c_acctbal"))
      big.join(rich, Seq("custkey"), "full_outer")
        .orderBy("custkey")
    }),

    "q_json_funcs" -> ((s, d) => {
      t(s, d, "events")
        .where(col("event_id") < 2000)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"))
        .orderBy("event_id")
    }),

    // row-level quarantine: malformed JSON rows are flagged and counted,
    // never silently dropped — the ingest gate between "parse" and
    // "pretend it parsed". Corruption is injected deterministically so
    // the gate has something to catch.
    "q_quarantine" -> ((s, d) => {
      val corrupted = t(s, d, "events")
        .where(col("event_id") < 2000)
        .withColumn("raw", when(col("event_id") % 97 === 0,
          expr("substring(props, 1, length(props) - 1)")).otherwise(col("props")))
      corrupted
        .withColumn("parsed", from_json(col("raw"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"),
          Map.empty[String, String]))
        .withColumn("quarantined", col("parsed").isNull || col("parsed.k").isNull)
        .select(col("event_id"), col("quarantined"),
          when(col("quarantined"), lit(null)).otherwise(col("parsed.k")).as("k"))
        .orderBy("event_id")
    }),

    // Spark 4 VariantType: parse once into the binary variant encoding,
    // then typed paths — the modern semi-structured column (vs repeated
    // string re-parsing with get_json_object)
    "q_variant" -> ((s, d) =>
      t(s, d, "events")
        .where(col("event_id") < 2000)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_var"),
          expr("variant_get(parse_json(props), '$.k', 'bigint') % 7").as("k_mod7"))
        .orderBy("event_id")),

    // correlated LATERAL subquery with ORDER BY + LIMIT: top-2 orders per
    // customer expressed as the SQL standard writes it (Catalyst
    // decorrelates to a ranked join — no per-row execution)
    "q_lateral" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("graft_lat_customer")
      t(s, d, "orders").createOrReplaceTempView("graft_lat_orders")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM graft_lat_customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM graft_lat_orders
          |         WHERE o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)
    }),
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)/COUNT(l_quantity) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)/COUNT(l_extendedprice) AS avg_price,
        | CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)/COUNT(l_discount) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "q_corr" ->
      """WITH a AS (SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | round((n * sxy - sx * sy) /
        |   (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_xy,
        | round((sxy - sx * sy / n) / n, 6) AS covar_pop,
        | round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "q_histogram" ->
      """WITH b AS (SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS mn,
        |   (CAST(MAX(o_totalprice) AS DOUBLE) - CAST(MIN(o_totalprice) AS DOUBLE)) / 20.0 AS w
        |  FROM orders),
        | k AS (SELECT CASE WHEN b.w = 0 THEN CAST(0 AS BIGINT)
        |     ELSE least(19, CAST(floor((o.o_totalprice - b.mn) / b.w) AS BIGINT)) END AS bucket,
        |   b.mn, b.w
        |  FROM orders o, b)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
        | round(mn + bucket * w, 6) AS bucket_lo,
        | round(mn + (bucket + 1) * w, 6) AS bucket_hi
        |FROM k GROUP BY bucket, mn, w ORDER BY bucket""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_filter_ops" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part
        |WHERE p_size > 10 AND p_size <= 40
        |  AND p_retailprice >= 920.0 AND p_retailprice < 980.0
        |  AND p_brand != 'Brand#5'
        |  AND p_type IN ('ECONOMY','SMALL','PROMO')
        |  AND p_brand NOT IN ('Brand#11','Brand#12')
        |  AND p_name LIKE '%gear%'
        |  AND p_name IS NOT NULL
        |ORDER BY p_partkey""".stripMargin,

    "q_agg_funcs" ->
      """SELECT o_orderpriority,
        | COUNT(*) AS n_orders,
        | COUNT(DISTINCT o_custkey) AS n_custs,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)/COUNT(o_totalprice) AS avg_price,
        | MIN(o_totalprice) AS min_price,
        | MAX(o_totalprice) AS max_price,
        | MIN(o_orderdate) AS first_order,
        | MAX(o_orderdate) AS last_order
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_global_agg" ->
      """SELECT COUNT(*) AS n_rows,
        | COUNT(DISTINCT l_suppkey) AS n_supps,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)/COUNT(l_extendedprice) AS avg_price,
        | MIN(l_extendedprice) AS min_price,
        | MAX(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |  AND o.o_orderdate >= TIMESTAMP '2000-01-01' AND o.o_orderdate < TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(row_number() OVER w AS BIGINT) AS order_seq,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS running_spend,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank
        |FROM orders
        |WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin,

    "q_topn_per_group" ->
      """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_distinct_custs" ->
      """SELECT DISTINCT o_custkey, o_orderstatus FROM orders
        |ORDER BY o_custkey, o_orderstatus""".stripMargin,

    "q_set_ops" ->
      """WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000.0),
        | building AS (SELECT c_custkey AS o_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT 'both' AS op, o_custkey AS custkey FROM (SELECT * FROM big INTERSECT SELECT * FROM building)
        |UNION ALL
        |SELECT 'big_only' AS op, o_custkey AS custkey FROM (SELECT * FROM big EXCEPT SELECT * FROM building)
        |UNION ALL
        |SELECT 'either' AS op, o_custkey AS custkey
        |  FROM (SELECT DISTINCT o_custkey FROM (SELECT * FROM big UNION ALL SELECT * FROM building))
        |ORDER BY op, custkey""".stripMargin,

    "q_set_ops_all" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0),
        | b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'intersect_all' AS op, o_custkey AS custkey FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'except_all' AS op, o_custkey AS custkey FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |ORDER BY op, custkey""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,

    "q_conditional_pivot" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) AS open_total,
        | CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) AS filled_total,
        | CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_window_analytics" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cdist,
        | first_value(o_totalprice) OVER w AS cheapest,
        | lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders WHERE o_orderkey < 2000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        | COALESCE(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS o_total,
        | COALESCE(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS f_total,
        | COALESCE(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS p_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, measure, value FROM (
        | SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
        | FROM lineitem WHERE l_orderkey < 100
        | UNION ALL
        | SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        | FROM lineitem WHERE l_orderkey < 100
        | UNION ALL
        | SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        | FROM lineitem WHERE l_orderkey < 100)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_name) AS name_upper,
        | lower(p_brand) AS brand_lower,
        | substr(p_name, 1, 5) AS name_pfx,
        | p_brand || '-' || p_type AS brand_type,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | trim('  ' || p_name || '  ') AS name_trim,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        | regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        | lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(month(o_orderdate) AS BIGINT) AS mo,
        | CAST(day(o_orderdate) AS BIGINT) AS dom,
        | CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        | date_trunc('month', o_orderdate) AS month_start,
        | CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT) AS days_to_y2k,
        | o_orderdate + INTERVAL 30 DAY AS plus_30d
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,

    "q_exists_subquery" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |                                 / COUNT(*) * 3.0 FROM orders))
        |ORDER BY c.c_custkey""".stripMargin,

    "q_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,

    "q_outer_join" ->
      """WITH big AS (
        |  SELECT o_custkey AS custkey, COUNT(*) AS n_big_orders
        |  FROM orders WHERE o_totalprice > 300000.0 GROUP BY o_custkey),
        | rich AS (
        |  SELECT c_custkey AS custkey, c_acctbal
        |  FROM customer WHERE c_acctbal > 8000.0)
        |SELECT COALESCE(big.custkey, rich.custkey) AS custkey,
        |  n_big_orders, c_acctbal
        |FROM big FULL JOIN rich ON big.custkey = rich.custkey
        |ORDER BY custkey""".stripMargin,

    "q_skew_report" ->
      """WITH c AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM orders GROUP BY o_custkey),
        | s AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
        |   CAST(COUNT(*) AS BIGINT) AS n_keys FROM c),
        | r AS (SELECT o_custkey, n_rows,
        |   round(n_rows / s.total_rows, 6) AS share,
        |   round(n_rows * s.n_keys / s.total_rows, 6) AS skew_factor,
        |   CAST(row_number() OVER (ORDER BY n_rows DESC, o_custkey) AS BIGINT) AS rk
        |  FROM c, s)
        |SELECT o_custkey, n_rows, share, skew_factor, rk FROM r
        |WHERE rk <= 20 ORDER BY rk""".stripMargin,

    "q_quarantine" ->
      """WITH c AS (SELECT event_id,
        |   CASE WHEN event_id % 97 = 0 THEN substring(props, 1, length(props) - 1)
        |        ELSE props END AS raw
        |  FROM events WHERE event_id < 2000)
        |SELECT event_id,
        | CASE WHEN NOT json_valid(raw) THEN true
        |      ELSE json_extract(raw, '$.k') IS NULL END AS quarantined,
        | CASE WHEN json_valid(raw) THEN CAST(json_extract_string(raw, '$.k') AS BIGINT)
        |      ELSE NULL END AS k
        |FROM c ORDER BY event_id""".stripMargin,

    "q_variant" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_var,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod7
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,

    "q_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
        |FROM events WHERE event_id < 2000
        |ORDER BY event_id""".stripMargin,
  )
}
