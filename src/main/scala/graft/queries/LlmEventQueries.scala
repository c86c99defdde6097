package graft.queries

import graft.llm.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import QueryDef.table
import LlmArtifacts._

/** Event-stream family over `events`: windowed rollups, sessionization, funnels, and the as-of join.
  * Split out of the former monolithic LlmQueries registry; shared index
  * artifacts live in [[LlmArtifacts]]. See that object for the scale notes
  * common to the family. */
private[queries] object LlmEventQueries {

  val defs: Seq[QueryDef] = Seq(

    // Tumbling-window aggregation over the event stream: 1h buckets ×
    // event_type; double sums fixed-pointed via floor(value*1000) so the
    // distributed sum is order-independent (bigint adds commute — the only
    // sum shape that hash-compares across engines).
    QueryDef("q_events_window",
      (s, d) => table(s, d, "events")
        .groupBy(expr("ts div 3600000000000").as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(floor(col("value") * 1000).cast("long")).as("value_milli"))
        .orderBy(col("hour_bucket"), col("event_type")),
      Some("""SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
             |       count(*) AS n_events, count(DISTINCT user_id) AS n_users,
             |       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
             |FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin)),

    // Bucketed point-in-interval join: clicks inside a 4-hour window
    // after each error of the same user. A plain BETWEEN join plans as a
    // nested-loop; the bucket decomposition makes it an equi-join on
    // (user, bucket) + residual filter — shuffle-hash-joinable at scale.
    QueryDef("q_interval_join",
      (s, d) => {
        val ev = table(s, d, "events")
        val err = ev.where(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"),
            col("ts").as("lo"), (col("ts") + 14400000000000L).as("hi"))
        val clk = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("t"))
        graft.streaming.EventStreams.pointInIntervalJoin(
            clk, err, Seq("user_id"), "t", "lo", "hi", bucketWidth = 14400000000000L)
          .select(col("user_id"), col("err_id"), col("click_id"))
          .orderBy(col("user_id"), col("err_id"), col("click_id"))
      },
      Some("""WITH err AS (
             |  SELECT user_id, event_id AS err_id, epoch_ns(ts) AS lo,
             |         epoch_ns(ts) + 14400000000000 AS hi
             |  FROM events WHERE event_type = 'error'),
             |clk AS (
             |  SELECT user_id, event_id AS click_id, epoch_ns(ts) AS t
             |  FROM events WHERE event_type = 'click')
             |SELECT c.user_id, e.err_id, c.click_id
             |FROM clk c JOIN err e
             |  ON c.user_id = e.user_id AND c.t >= e.lo AND c.t <= e.hi
             |ORDER BY c.user_id, e.err_id, c.click_id""".stripMargin)),

    // Cohort retention at daily granularity: users bucketed by first-seen
    // day, distinct actives per (cohort, day offset). The raw stream
    // collapses in two user-keyed partial aggregates before the join.
    QueryDef("q_retention_cohorts",
      (s, d) => graft.streaming.EventStreams.retentionCohorts(
          table(s, d, "events"), periodNanos = 86400000000000L)
        .orderBy(col("cohort"), col("period_offset")),
      Some("""WITH fs AS (
             |  SELECT user_id, min(epoch_ns(ts)) // 86400000000000 AS cohort
             |  FROM events GROUP BY user_id),
             |act AS (
             |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS period
             |  FROM events)
             |SELECT fs.cohort, act.period - fs.cohort AS period_offset,
             |       count(DISTINCT act.user_id)::BIGINT AS n_active
             |FROM act JOIN fs ON act.user_id = fs.user_id
             |GROUP BY 1, 2 ORDER BY cohort, period_offset""".stripMargin)),

    // Gap-based sessionization: a session breaks after 30 min of user
    // inactivity — lag + running sum windows, then a per-session rollup.
    // The window partitions by user_id: one shuffle, then all window work is
    // partition-local (the 100 TB shape for event-stream sessionization).
    QueryDef("q_sessionize",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("events")
        s.sql("""SELECT user_id, session_id, count(*) AS n_events,
                |       min(event_id) AS first_event, max(event_id) AS last_event
                |FROM (
                |  SELECT user_id, event_id,
                |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                |                        ROWS UNBOUNDED PRECEDING) AS session_id
                |  FROM (
                |    SELECT user_id, event_id, ts,
                |           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                |                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                |                     > 1800000000000 THEN 1 ELSE 0 END AS brk
                |    FROM events))
                |GROUP BY user_id, session_id
                |ORDER BY user_id, session_id""".stripMargin)
      },
      Some("""SELECT user_id, session_id, count(*) AS n_events,
             |       min(event_id) AS first_event, max(event_id) AS last_event
             |FROM (
             |  SELECT user_id, event_id,
             |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM (
             |    SELECT user_id, event_id, ts,
             |           CASE WHEN lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |                  OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |                     > 1800000000000 THEN 1 ELSE 0 END AS brk
             |    FROM events))
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // As-of join: every click event annotated with the user's most recent
    // view (timestamp + value) at-or-before it. The union+window plan
    // shuffles once on user_id with NO join operator; the oracle is
    // DuckDB's native ASOF LEFT JOIN — two engines, two mechanisms, one
    // answer.
    QueryDef("q_asof_join",
      (s, d) => {
        val ev = table(s, d, "events")
        val clicks = ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val views = ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("ts").as("view_ts"),
            col("value").as("view_value"))
        graft.streaming.EventStreams.asofJoin(
            clicks, views, Seq("user_id"), "ts", Seq("view_ts", "view_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH clicks AS (
             |  SELECT event_id, user_id, epoch_ns(ts) AS ts
             |  FROM events WHERE event_type = 'click'),
             |views AS (
             |  SELECT user_id, epoch_ns(ts) AS ts, epoch_ns(ts) AS view_ts,
             |         value AS view_value
             |  FROM events WHERE event_type = 'view')
             |SELECT c.event_id, c.user_id, c.ts, v.view_ts, v.view_value
             |FROM clicks c ASOF LEFT JOIN views v
             |  ON c.user_id = v.user_id AND c.ts >= v.ts
             |ORDER BY c.event_id""".stripMargin)),

    // Per-user conversion funnel view → purchase: earliest view, earliest
    // purchase at-or-after it (null = never converted). Aggregate-before-
    // join — every exchange keys on user_id.
    QueryDef("q_funnel",
      (s, d) => graft.streaming.EventStreams
        .funnel(table(s, d, "events"), fromType = "view", toType = "purchase")
        .orderBy(col("user_id")),
      Some("""WITH fv AS (
             |  SELECT user_id, min(epoch_ns(ts)) AS from_ts
             |  FROM events WHERE event_type = 'view' GROUP BY user_id),
             |cv AS (
             |  SELECT e.user_id, min(epoch_ns(e.ts)) AS to_ts
             |  FROM events e JOIN fv ON fv.user_id = e.user_id
             |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= fv.from_ts
             |  GROUP BY e.user_id)
             |SELECT fv.user_id, fv.from_ts, cv.to_ts
             |FROM fv LEFT JOIN cv ON cv.user_id = fv.user_id
             |ORDER BY fv.user_id""".stripMargin))
  )
}
