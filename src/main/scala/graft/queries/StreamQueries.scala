package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}
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
  )

  val oracles: Map[String, String] = Map(
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
