package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forms of the event-stream operators the batch layer answers
  * over the `events` table (q_events_window / q_sessionize): a watermarked
  * tumbling-window aggregation and a gap-based sessionizer with explicit
  * keyed state. These are the Structured Streaming counterparts a live
  * training-data pipeline runs while the batch queries serve backfill —
  * same semantics, incremental execution.
  *
  * Scale shape: both operators shuffle ONCE on their key (window bucket /
  * user id); the watermark bounds state size, and session state is one
  * small record per open session per user. No other stage holds state. */
object EventStreams {

  /** Tumbling 1h windows × event_type with a watermark: late events beyond
    * `lateness` are dropped and completed windows are emitted/evicted —
    * unbounded-state-free by construction. Input needs (ts: Timestamp,
    * event_type, user_id, value). */
  def hourlyWindows(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        sum(floor(col("value") * 1000).cast("long")).as("value_milli"))

  /** Streaming exact dedup AT INGEST — the live counterpart of
    * `Dedup.exact`/`survivors`: a document whose content hash was already
    * seen within the `horizon` is dropped before it ever lands in the
    * corpus. State is ONE small (hash, ts) record per distinct document
    * seen inside the watermark horizon, evicted automatically — the
    * bounded-state contract every at-ingest dedup runs on (a re-occurrence
    * AFTER eviction passes; the batch dedup operators remain the exact
    * end-of-corpus pass). Input needs (ts: Timestamp, text) plus any
    * payload columns, which ride through untouched.
    *
    * Scale shape: one shuffle keyed by the 16-byte content hash (never the
    * text payload as key), then per-partition state lookups — the same
    * key discipline as the batch hash-dedup. */
  def dedupStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  final case class SessionEvent(userId: Long, eventId: Long, tsNanos: Long)
  final case class SessionState(sessionId: Long, lastTs: Long,
                                firstEvent: Long, lastEvent: Long, n: Long)
  final case class SessionOut(userId: Long, sessionId: Long, nEvents: Long,
                              firstEvent: Long, lastEvent: Long)

  /** Gap-based sessionization as explicit keyed state
    * (flatMapGroupsWithState): a session closes after `gapNanos` of user
    * inactivity and is emitted exactly once, on close. State per user = the
    * one open session. The batch q_sessionize over the same events yields
    * the same (user, session) rollups for closed sessions. Tail sessions
    * (no further events ever) stay open here; a live deployment flushes
    * them with EventTimeTimeout against the stream's watermark — a
    * processing-time timeout is deliberately NOT used, as it makes the
    * query self-trigger empty batches forever. */
  def sessionize(events: Dataset[SessionEvent], gapNanos: Long)
                (implicit enc1: org.apache.spark.sql.Encoder[SessionState],
                 enc2: org.apache.spark.sql.Encoder[SessionOut]): Dataset[SessionOut] = {
    import org.apache.spark.sql.Encoders
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption
          // events within a batch arrive unordered: sort by (ts, eventId),
          // the same total order the batch sessionizer uses
          batch.toSeq.sortBy(e => (e.tsNanos, e.eventId)).foreach { e =>
            st match {
              case Some(s) if e.tsNanos - s.lastTs <= gapNanos =>
                st = Some(s.copy(lastTs = e.tsNanos, lastEvent = e.eventId, n = s.n + 1))
              case Some(s) => // gap exceeded: close the old session, open next
                out += SessionOut(userId, s.sessionId, s.n, s.firstEvent, s.lastEvent)
                st = Some(SessionState(s.sessionId + 1, e.tsNanos, e.eventId, e.eventId, 1))
              case None =>
                st = Some(SessionState(1L, e.tsNanos, e.eventId, e.eventId, 1))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  final case class FunnelEvent(userId: Long, eventType: String, tsNanos: Long)
  final case class FunnelState(fromTs: Long, converted: Boolean)
  final case class FunnelOut(userId: Long, fromTs: Long, toTs: Long)

  /** Streaming form of [[funnel]]: per-user conversion tracking as explicit
    * keyed state. A conversion (first `toType` at-or-after the user's
    * earliest seen `fromType`) is emitted EXACTLY ONCE, when it happens;
    * state afterwards is a two-field tombstone that suppresses re-emission.
    * Within a batch events are sorted by timestamp with `fromType` ahead of
    * other types at equal timestamps — the batch funnel's conversion filter
    * is `ts >= from_ts` (equality converts), so a view and a purchase
    * sharing a timestamp must apply view-first regardless of arrival order;
    * an out-of-order `fromType`
    * arriving in a LATER batch lowers the stored first-view time only while
    * the user is unconverted — after conversion the emitted pair is final,
    * the usual exactly-once-output tradeoff of streaming funnels (a
    * production deployment bounds that window with a watermark the way
    * [[sessionize]] bounds session state). State per user = one small
    * record; the one shuffle keys on user_id. */
  def funnelStream(events: Dataset[FunnelEvent], fromType: String, toType: String)
                  (implicit enc1: org.apache.spark.sql.Encoder[FunnelState],
                   enc2: org.apache.spark.sql.Encoder[FunnelOut]): Dataset[FunnelOut] = {
    import org.apache.spark.sql.Encoders
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelOut]
          var st = state.getOption
          batch.toSeq.sortBy(e => (e.tsNanos, if (e.eventType == fromType) 0 else 1))
            .foreach { e =>
            st match {
              case None if e.eventType == fromType =>
                st = Some(FunnelState(e.tsNanos, converted = false))
              case Some(s) if !s.converted && e.eventType == fromType && e.tsNanos < s.fromTs =>
                st = Some(s.copy(fromTs = e.tsNanos))
              case Some(s) if !s.converted && e.eventType == toType && e.tsNanos >= s.fromTs =>
                out += FunnelOut(userId, s.fromTs, e.tsNanos)
                st = Some(s.copy(converted = true))
              case _ => ()
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** As-of join — the time-series "last known state" join (DuckDB/kdb
    * ASOF semantics): each left row picks up the value columns of the
    * LATEST right row sharing its keys with `right.ts <= left.ts`
    * (inclusive), or nulls when no right row precedes it.
    *
    * Spark-first shape: a per-row range join would explode to
    * |left| × |right rows per key| before collapsing back down; instead
    * the two sides UNION — right rows carrying their values, left rows
    * carrying nulls — and ONE key-partitioned window running
    * `last(value, ignoreNulls)` ordered by (ts, side) fills every left
    * row from its nearest preceding right row. Right rows sort BEFORE
    * left rows at equal ts, which makes the match inclusive. One shuffle
    * on the key, no join operator at all, output size = |left|. (The
    * oracle cross-checks this plan against DuckDB's native ASOF JOIN.)
    *
    * Preconditions: right must be unique per (keys, ts) — duplicate
    * timestamps would make the fill collect-order-dependent (DuckDB's
    * ASOF shares the requirement), so the plan ENFORCES it: duplicate
    * right rows sort adjacent in the fill window's own ordering, a lag
    * check flags them, and any flagged key group fails loudly at
    * execution (`raise_error` — the hllEstimate/cmsEstimate fail-loud
    * discipline) instead of silently breaking the cross-engine
    * bit-equality contract. The guard rides the SAME exchange as the
    * fill (one extra window pass, zero extra shuffles); value columns must not be null in
    * right rows (a null value would fall through to an older row instead
    * of surfacing); left/value column names must not collide. Right rows
    * with a NULL timestamp are dropped (the ASOF predicate
    * `left.ts >= right.ts` can never match them — left untouched they
    * would sort FIRST ascending and pollute every fill); a left row with
    * a NULL timestamp precedes every surviving right row and correctly
    * gets all-null values. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.nonEmpty, "as-of join with no value columns is a no-op")
    require(leftCols.intersect(valueCols).isEmpty,
      s"value columns collide with left columns: ${leftCols.intersect(valueCols)}")
    val l = left.select(leftCols.map(col) ++ Seq(lit(1).as("_side")) ++
      valueCols.map(v => lit(null).cast(right.schema(v).dataType).as(v)): _*)
    val r = right.where(col(tsCol).isNotNull)
      .select(keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("_side")) ++
      valueCols.map(col) ++
      leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // duplicate-right detection in the fill's own sort order: right rows
    // precede left rows at equal ts, so two right rows sharing (keys, ts)
    // are ADJACENT — a lag over the same (partition, ordering) spec flags
    // the second one, and a whole-partition max propagates the flag to the
    // surviving left rows (both windows share the one exchange)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    l.unionByName(r)
      .withColumn("_dupf",
        when(col("_side") === 0 &&
          lag(col(tsCol), 1).over(wOrd) === col(tsCol) &&
          lag(col("_side"), 1).over(wOrd) === 0, 1).otherwise(0))
      .select(leftCols.map(col) ++
        Seq(col("_side"), max(col("_dupf")).over(wAll).as("_dup")) ++
        valueCols.map(v => last(col(v), ignoreNulls = true).over(w).as(v)): _*)
      .where(col("_side") === when(col("_dup") === 1,
        // the message deliberately avoids the substring "Join": it is
        // embedded verbatim in the physical plan text, which the plan-shape
        // gates (spec + rehearsal) scan for join OPERATORS by that token
        raise_error(lit("as-of: right side has duplicate (keys, ts) rows — " +
          "the last-value fill would be collect-order-nondeterministic")))
        .otherwise(lit(1)))
      .drop("_side", "_dup")
  }

  /** BUCKETED POINT-IN-INTERVAL JOIN — the range-join family Spark's
    * optimizer has no native strategy for (a plain `t BETWEEN lo AND hi`
    * condition plans as a broadcast-nested-loop or cartesian product):
    * keep every `points` row whose `tCol` falls inside a `intervals` row's
    * `[loCol, hiCol]`, matched per `keyCols`.
    *
    * The standard bucketing decomposition: each interval explodes into the
    * `bucketWidth`-sized buckets it covers, each point maps to exactly one
    * bucket, and the join becomes an EQUI-join on (keys, bucket) + a
    * residual range filter — shuffle-hash-joinable at any scale. The
    * candidate blowup per interval is ⌈len/W⌉+1 rows; an interval whose
    * span exceeds `maxBucketsPerInterval` fails loudly IN-PLAN
    * (`raise_error`, same discipline as the as-of duplicate guard) rather
    * than silently exploding the build side — pick `bucketWidth` near the
    * typical interval length so the factor stays ≈ 2. */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
                          keyCols: Seq[String], tCol: String,
                          loCol: String, hiCol: String, bucketWidth: Long,
                          maxBucketsPerInterval: Int = 4): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxBucketsPerInterval >= 1, s"bad maxBucketsPerInterval")
    // exact integer FLOOR division — `/` routes through double, and above
    // 2^53 (epoch nanos are ~2^60) values near a bucket boundary land in
    // the neighbouring bucket. Matches are still found either way (long→
    // double and x/w are monotone, so loB <= ptB <= hiB survives rounding)
    // but the bucket key then deviates from the documented floor(t/W) and
    // the ⌈len/W⌉+1 span accounting the fail-loud guard enforces; exact
    // integers close that drift (same discipline retentionCohorts
    // documents). floor = truncating `div` minus one when the remainder is
    // negative — overflow-free over the FULL long domain (a pmod-subtract
    // formulation would wrap within bucketWidth of Long.MinValue). Column
    // names are backtick-escaped before interpolation into expr().
    def bucketOf(rawName: String): Column = {
      val name = rawName.replace("`", "``")
      expr(s"(`$name` div ${bucketWidth}L) - " +
        s"(CASE WHEN `$name` % ${bucketWidth}L < 0 THEN 1L ELSE 0L END)")
    }
    val loB = bucketOf(loCol)
    val hiB = bucketOf(hiCol)
    val iv = intervals
      .withColumn("_nb", hiB - loB + 1L)
      // the inverted check must come FIRST and must gate the sequence stop
      // value: sequence(lo, hi) with hi < lo generates a DESCENDING
      // sequence (implicit step −1), so an interval with hi far below lo
      // would materialize a huge bucket list before any span check — and
      // its negative _nb sails under the `> maxBucketsPerInterval` test
      .withColumn("_b", explode(sequence(loB,
        when(col("_nb") < 1L,
          raise_error(concat(lit("inverted interval (hi < lo) in column pair ("),
            lit(s"$loCol, $hiCol) — fix or filter the interval bounds")))
            .cast("long"))
        .when(col("_nb") > maxBucketsPerInterval,
          // the message avoids the substring "Join" — plan-shape gates
          // scan the physical plan text for join operators by that token
          raise_error(lit(s"interval spans more than $maxBucketsPerInterval " +
            s"buckets of width $bucketWidth — widen bucketWidth or split " +
            "the interval")).cast("long"))
          .otherwise(hiB))))
      .drop("_nb")
    val pt = points.withColumn("_b", bucketOf(tCol))
    pt.join(iv, keyCols :+ "_b")
      .where(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("_b")
  }

  /** COHORT RETENTION — the product-analytics staple: users grouped by
    * first-seen period (their cohort), then for each (cohort, period
    * offset) the number of DISTINCT cohort members active in that period.
    * `periodNanos` is the cohort/activity granularity (a week, a day).
    *
    * Scale shape: first-seen is one user-keyed min-aggregate; activity
    * dedups to (user, period) rows — both partial-aggregated map-side, so
    * the raw stream collapses before anything joins. The join is
    * user-keyed and co-partitioned with the aggregates feeding it; the
    * final rollup carries (cohort, offset, user) rows only. All metrics
    * integer-exact. */
  def retentionCohorts(events: DataFrame, periodNanos: Long,
                       userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    require(periodNanos > 0, s"periodNanos must be positive: $periodNanos")
    // `div` (integer division), NOT `/`: the latter routes through double,
    // whose 53-bit mantissa cannot hold epoch nanos — a boundary timestamp
    // could land in the wrong period
    val cohorts = events.groupBy(col(userCol))
      .agg(expr(s"min($tsCol) div $periodNanos").as("cohort"))
    val activity = events
      .select(col(userCol), expr(s"$tsCol div $periodNanos").as("period"))
      .distinct()
    activity.join(cohorts, Seq(userCol))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("period_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }

  /** Per-user conversion funnel `fromType` → `toType`: for each user with at
    * least one `fromType` event, the earliest such timestamp and the
    * earliest `toType` timestamp AT OR AFTER it (null if the user never
    * converted). Input needs (user_id, event_type, ts) with ts totally
    * ordered (nanos-as-long in the testdata parquet).
    *
    * Scale shape: both stages aggregate BEFORE joining, so the join carries
    * one row per user per side, never the raw event stream; every
    * shuffle — the two min-aggregations and the joins — is keyed on
    * user_id, so after the first exchange the whole funnel is co-partitioned
    * (one physical shuffle of each filtered branch, reused downstream).
    * Longer funnels compose by folding this pairwise step. */
  def funnel(events: DataFrame, fromType: String, toType: String): DataFrame = {
    val firstFrom = events.where(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(col("ts")).as("from_ts"))
    val firstToAfter = events.where(col("event_type") === toType)
      .join(firstFrom, "user_id")
      .where(col("ts") >= col("from_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("to_ts"))
    firstFrom.join(firstToAfter, Seq("user_id"), "left_outer")
      .select(col("user_id"), col("from_ts"), col("to_ts"))
  }
}
