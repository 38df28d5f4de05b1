package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Cdc, RangeJoin}
import graft.sources.Ingestor
import graft.streaming.EventStream

/** SURVEY §2.5: streaming transforms, verified through their
  * batch-equivalent plans (Structured Streaming's batch/stream unification
  * means the SAME transform function runs under `readStream` — the
  * streaming-mode execution is covered by the MemoryStream specs). */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window" -> ((s, d) =>
      EventStream.windowedAgg(Ingestor.events(s, d))
        .orderBy("window_start", "event_type")),

    "sessionize" -> ((s, d) =>
      EventStream.sessionize(Ingestor.events(s, d))
        .orderBy("user_id", "session_id")),

    // native session_window form of the same semantics (no ordinal —
    // sessions are identified by their start time)
    "sessionize_native" -> ((s, d) =>
      EventStream.sessionizeNative(Ingestor.events(s, d))
        .orderBy("user_id", "session_start")),

    // purchase attribution: each purchase joined to the user's most
    // recent signup at-or-before it (the as-of join Spark lacks natively)
    "q_asof_join" -> ((s, d) => {
      val ev = Ingestor.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      AsOfJoin.asOf(purchases, signups, key = "user_id",
          leftTs = "ts", rightTs = "signup_ts", valueCols = Seq("signup_ts"))
        .orderBy("event_id")
    }),

    // interval join: assign each event to its session's [start, end]
    // window — banded equi-join, not a nested-loop range join
    "q_range_join" -> ((s, d) => {
      val ev = Ingestor.events(s, d)
      val sessions = EventStream.sessionize(ev)
      RangeJoin.bandedIntervalJoin(
          ev.select("event_id", "user_id", "ts"), "ts",
          sessions, "session_start", "session_end", key = "user_id")
        .select("event_id", "user_id", "session_id")
        .orderBy("event_id")
    }),
    // changelog replay: events as an I/U/D change stream per user
    // (signup = insert, error = account delete, rest = update); the
    // final state is the latest non-deleted change per key
    "cdc_apply" -> ((s, d) => {
      val log = Ingestor.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"), col("value"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"))
      Cdc.applyChangeLog(log, Seq("user_id"), Seq("ts", "event_id"))
        .select("user_id", "ts", "op", "value")
        .orderBy("user_id")
    }),

    // type-2 SCD: per-user history of event_type runs with validity
    // intervals (gaps-and-islands collapse, one shuffle)
    "scd2_history" -> ((s, d) =>
      Cdc.type2History(
          Ingestor.events(s, d).select("user_id", "ts", "event_id", "event_type"),
          Seq("user_id"), Seq("ts", "event_id"), "event_type")
        .select("user_id", "event_type", "valid_from", "valid_to",
          "is_current", "n_events")
        .orderBy("user_id", "valid_from")),

    // ordered-event funnel: users who signed up, then clicked at or
    // after their first signup, then purchased at or after that click —
    // each stage one aggregate + one equi-join on the user key
    "q_funnel" -> ((s, d) => {
      val ev = Ingestor.events(s, d)
      val s1 = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = ev.where(col("event_type") === "click")
        .join(s1, "user_id").where(col("ts") >= col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.where(col("event_type") === "purchase")
        .join(s2, "user_id").where(col("ts") >= col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      s1.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("1_signup"))
        .unionByName(s2.agg(count(lit(1)).as("n_users"))
          .withColumn("stage", lit("2_click")))
        .unionByName(s3.agg(count(lit(1)).as("n_users"))
          .withColumn("stage", lit("3_purchase")))
        .select("stage", "n_users")
        .orderBy("stage")
    }),

    // weekly cohort retention: users grouped by first-signup week, and
    // for each later week, how many were active — the activity relation
    // is distinct (user, week) BEFORE the join, so the shuffle carries
    // one row per user-week, not per event
    "q_cohort" -> ((s, d) => {
      val ev = Ingestor.events(s, d)
      val cohort = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("first_ts"))
        .select(col("user_id"),
          date_trunc("week", col("first_ts")).cast("timestamp_ntz").as("cohort_week"))
      val activity = ev.select(col("user_id"),
        date_trunc("week", col("ts")).cast("timestamp_ntz").as("act_week")).distinct()
      cohort.join(activity, "user_id")
        .where(col("act_week") >= col("cohort_week"))
        .withColumn("week_offset",
          expr("datediff(act_week, cohort_week) div 7").cast("long"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort_week", "week_offset")
    }),

    // behavioural distribution stats: Shannon entropy of each user's
    // event-type mix. p*ln(p) terms are rounded to exact decimals BEFORE
    // the sum, so the aggregate is associative and engine-identical
    "q_entropy" -> ((s, d) => {
      import graft.functions.dec
      val counts = Ingestor.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val totals = counts.groupBy("user_id").agg(sum("c").as("total"))
      counts.join(totals, "user_id")
        .withColumn("term", dec((col("c") / col("total")) * log(col("c") / col("total"))))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_types"),
          (-sum(col("term")).cast("double")).as("entropy"))
        .orderBy("user_id")
    }),

    // trailing-1h moving aggregate per user: a value-based (RANGE) frame
    // over epoch micros — tie-safe (peers share the frame) and
    // decimal-exact (double sums never drift with partition order)
    "q_moving_avg" -> ((s, d) => {
      import graft.functions.dec
      val ev = Ingestor.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600000000L, 0)
      ev.withColumn("mv_cnt", count(lit(1)).over(w))
        .withColumn("mv_avg",
          round(sum(dec(col("value"))).over(w).cast("double") / col("mv_cnt"), 6))
        .select("event_id", "user_id", "ts", "mv_cnt", "mv_avg")
        .orderBy("event_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "cdc_apply" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
        |   CASE WHEN event_type = 'signup' THEN 'I'
        |        WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        | r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM e)
        |SELECT user_id, ts, op, value FROM r WHERE rk = 1 AND op <> 'D'
        |ORDER BY user_id""".stripMargin,

    "scd2_history" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
        | m AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |     OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | r AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS run
        |  FROM m),
        | g AS (SELECT user_id, run, MIN(event_type) AS event_type, MIN(ts) AS valid_from,
        |   COUNT(*) AS n_events
        |  FROM r GROUP BY user_id, run)
        |SELECT user_id, event_type, valid_from,
        | lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) AS valid_to,
        | lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) IS NULL AS is_current,
        | n_events
        |FROM g ORDER BY user_id, valid_from""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        | s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        | s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY e.user_id),
        | s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY e.user_id)
        |SELECT '1_signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
        |UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM s2
        |UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM s3
        |ORDER BY stage""".stripMargin,

    "q_cohort" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        | cohort AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        |  FROM e WHERE event_type = 'signup' GROUP BY user_id),
        | act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM e)
        |SELECT c.cohort_week,
        | CAST(date_diff('day', c.cohort_week, a.act_week) // 7 AS BIGINT) AS week_offset,
        | CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS n_active
        |FROM cohort c JOIN act a ON c.user_id = a.user_id
        |WHERE a.act_week >= c.cohort_week
        |GROUP BY c.cohort_week, week_offset
        |ORDER BY c.cohort_week, week_offset""".stripMargin,

    "q_entropy" ->
      """WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY user_id, event_type),
        | t AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS total FROM c GROUP BY user_id),
        | j AS (SELECT c.user_id,
        |   CAST((c.c / t.total) * ln(c.c / t.total) AS DECIMAL(38,6)) AS term
        |  FROM c JOIN t ON c.user_id = t.user_id)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_types,
        | -CAST(SUM(term) AS DOUBLE) AS entropy
        |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_moving_avg" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        | m AS (SELECT event_id, user_id, ts,
        |   CAST(COUNT(*) OVER w AS BIGINT) AS mv_cnt,
        |   CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS mv_sum
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ts, mv_cnt, round(mv_sum / mv_cnt, 6) AS mv_avg
        |FROM m ORDER BY event_id""".stripMargin,

    "stream_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type FROM events),
        | p AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'purchase'),
        | s AS (SELECT user_id, ts AS signup_ts FROM e WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id, p.ts, p.value, s.signup_ts AS asof_signup_ts
        |FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.signup_ts
        |ORDER BY p.event_id""".stripMargin,

    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        | m AS (SELECT user_id, ts, event_id,
        |   CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | sess0 AS (SELECT user_id, ts,
        |   CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
        |  FROM m),
        | sessions AS (SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end
        |  FROM sess0 GROUP BY user_id, session_id)
        |SELECT e.event_id, e.user_id, s.session_id
        |FROM e JOIN sessions s
        |  ON e.user_id = s.user_id AND e.ts BETWEEN s.session_start AND s.session_end
        |ORDER BY e.event_id""".stripMargin,

    "sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        | m AS (SELECT user_id, ts, event_id,
        |   CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | s AS (SELECT user_id, ts,
        |   CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
        | COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "sessionize_native" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        | m AS (SELECT user_id, ts, event_id,
        |   CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | s AS (SELECT user_id, ts,
        |   CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
        | COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
