package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryDef.table

/** Kupo's operator inventory embodied as generic relational pipelines over
  * the driver tables (FIXTURES.md §B mapping) — each one DuckDB-checkable.
  * Money outputs use scaled-BIGINT fixed point (`floor(x * 100 + 0.5)` —
  * pure IEEE double ops, bit-identical across engines, then exact integer
  * arithmetic): DOUBLE→DECIMAL casts round differently between engines on
  * half-way values and decimals hash differently in the driver compare, so
  * the compare surface stays integer/string-only. Scale notes inline. */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // P3/F1 — exact-match filter + projection. Pushes c_mktsegment into the
    // parquet scan; prunes to 3 columns.
    QueryDef("q_p3_filter_exact",
      (s, d) => table(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"),
          floor(col("c_acctbal") * 100 + 0.5).as("acctbal_cents"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name,
             |       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
             |FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin)),

    // P5/O1 — prefix predicate (the delegation-part LIKE 'prefix%' shape);
    // pushes a StartsWith filter down to parquet.
    QueryDef("q_p5_filter_prefix",
      (s, d) => table(s, d, "part")
        .where(col("p_name").startsWith("small"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, p_name, p_brand FROM part
             |WHERE p_name LIKE 'small%' ORDER BY p_partkey""".stripMargin)),

    // F2 — slot-range scan (created_after/created_before shape) on a
    // min/max-prunable column.
    QueryDef("q_f2_slot_range",
      (s, d) => table(s, d, "orders")
        .where(col("o_orderdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
               col("o_orderdate") <= expr("timestamp'1997-12-31 00:00:00'"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
             |ORDER BY o_orderkey""".stripMargin)),

    // F3 — status flag: spent_at IS NULL analogue over a derived nullable.
    QueryDef("q_f3_status_flag",
      (s, d) => table(s, d, "lineitem")
        .withColumn("spent_mark", when(col("l_returnflag") === "N", lit(null)).otherwise(col("l_returnflag")))
        .where(col("spent_mark").isNull)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE (CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END) IS NULL
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // F4 — the join spine: fact ⋈ orders with broadcast dimension chain
    // (customer→nation→region), map-side partial aggregation, exact decimals.
    // At 100 TB: lineitem⋈orders shuffles on orderkey (or is co-bucketed);
    // everything else broadcasts.
    QueryDef("q_f4_join_broadcast",
      (s, d) => {
        // price/discount to integer cents first, then revenue in units of
        // 1e-4: pure BIGINT arithmetic, so the distributed sum commutes and
        // both engines agree bit-for-bit
        val li = table(s, d, "lineitem")
          .withColumn("revenue_c4",
            floor(col("l_extendedprice") * 100 + 0.5) *
              (lit(100L) - floor(col("l_discount") * 100 + 0.5)))
        li.join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(col("revenue_c4")).as("revenue_c4"),
               count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_c4,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders   ON l_orderkey  = o_orderkey
             |JOIN customer ON o_custkey   = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // F5 — left-outer join (checkpoints-for-spent_at shape): count preserves
    // customers with zero orders.
    QueryDef("q_f5_left_join",
      (s, d) => table(s, d, "customer")
        .join(table(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // F6 — multi-key sort + top-k (TakeOrderedAndProject: no full sort at scale).
    QueryDef("q_f6_sort_topk",
      (s, d) => table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        .orderBy(col("l_shipdate").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
             |ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC LIMIT 100""".stripMargin)),

    // R1 — count under predicate.
    QueryDef("q_r1_count",
      (s, d) => table(s, d, "lineitem")
        .where(col("l_discount") > 0.05)
        .agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM lineitem WHERE l_discount > 0.05")),

    // R8 — max + argmax (max_by semantics with a deterministic tie-break:
    // smallest orderkey among ties).
    QueryDef("q_r8_argmax",
      (s, d) => {
        val o = table(s, d, "orders")
        val m = o.groupBy(col("o_orderstatus").as("status"))
          .agg(max(col("o_totalprice")).as("mx"))
        m.join(o, m("status") === o("o_orderstatus") && m("mx") === o("o_totalprice"))
          .groupBy(col("status"))
          .agg(floor(max(col("o_totalprice")) * 100 + 0.5).as("max_price_cents"),
               min(col("o_orderkey")).as("argmax_key"))
          .orderBy(col("status"))
      },
      Some("""WITH m AS (SELECT o_orderstatus AS status, max(o_totalprice) AS mx
             |           FROM orders GROUP BY o_orderstatus)
             |SELECT status, CAST(floor(max(o_totalprice) * 100 + 0.5) AS BIGINT) AS max_price_cents,
             |       min(o_orderkey) AS argmax_key
             |FROM m JOIN orders ON status = o_orderstatus AND mx = o_totalprice
             |GROUP BY status ORDER BY status""".stripMargin)),

    // R7 — ancestors: rows strictly before a point, newest first, top-k.
    // ts is read as i64 nanos (see QueryDef.table); 1717200000e9 = 2024-06-01 UTC.
    QueryDef("q_r7_topk_before",
      (s, d) => table(s, d, "events")
        .where(col("ts") < lit(1717200000000000000L))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").asc)
        .limit(20),
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE epoch_ns(ts) < 1717200000000000000
             |ORDER BY epoch_ns(ts) DESC, event_id ASC LIMIT 20""".stripMargin)),

    // R6 — log-spaced checkpoint sampling over event_id-as-slot: nearest
    // event at-or-after tip−offset for offsets 0,1,2,4,…,512; dedup, desc.
    // One conditional-min aggregation pass (map-side combined) instead of a
    // non-equi join that would multiply the table by the offset count.
    QueryDef("q_r6_log_checkpoints",
      (s, d) => {
        import s.implicits._
        val ev = table(s, d, "events").select(col("event_id"))
        val tip = ev.agg(max("event_id")).head().getLong(0)
        val offsets = Seq(0L, 1L, 2L) ++ Iterator.iterate(4L)(_ * 2).takeWhile(_ <= 512L)
        val targets = offsets.map(tip - _).filter(_ >= 0).distinct
        val minCols = targets.zipWithIndex.map { case (t, i) =>
          min(when(col("event_id") >= t, col("event_id"))).as(s"m$i")
        }
        val row = ev.agg(minCols.head, minCols.tail: _*).head()
        val cps = targets.indices
          .flatMap(i => if (row.isNullAt(i)) None else Some(row.getLong(i))).distinct
        cps.toDF("checkpoint").orderBy(col("checkpoint").desc)
      },
      Some("""WITH tip AS (SELECT max(event_id) AS t FROM events),
             |     offs(off) AS (VALUES (0),(1),(2),(4),(8),(16),(32),(64),(128),(256),(512)),
             |     targets AS (SELECT t - off AS target FROM tip, offs WHERE t - off >= 0)
             |SELECT DISTINCT checkpoint FROM (
             |  SELECT target, min(event_id) AS checkpoint
             |  FROM events, targets WHERE event_id >= target GROUP BY target)
             |ORDER BY checkpoint DESC""".stripMargin)),

    // U3 — retention GC: keep only rows inside the safe window ending at tip.
    QueryDef("q_u3_retention",
      (s, d) => {
        val ev = table(s, d, "events")
        val tip = ev.agg(max("event_id").as("tip"))
        ev.crossJoin(broadcast(tip))
          .where(col("event_id") >= col("tip") - 500)
          .select(col("event_id"), col("event_type"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, event_type FROM events
             |WHERE event_id >= (SELECT max(event_id) FROM events) - 500
             |ORDER BY event_id""".stripMargin)),

    // U4 — anti-join GC (orphaned binary_data shape).
    QueryDef("q_u4_antijoin",
      (s, d) => table(s, d, "events")
        .join(table(s, d, "customer").where(col("c_mktsegment") === "BUILDING"),
          col("user_id") === col("c_custkey"), "left_anti")
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id FROM events e
             |WHERE NOT EXISTS (SELECT 1 FROM customer c
             |                  WHERE c.c_custkey = e.user_id AND c.c_mktsegment = 'BUILDING')
             |ORDER BY event_id""".stripMargin)),

    // M1/M2 — explode (posexplode-shaped flatten) + re-aggregate.
    QueryDef("q_m2_explode",
      (s, d) => table(s, d, "orders")
        .select(explode(split(col("o_orderpriority"), "-")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("token")),
      Some("""SELECT token, count(*) AS n FROM (
             |  SELECT unnest(string_split(o_orderpriority, '-')) AS token FROM orders)
             |GROUP BY token ORDER BY token""".stripMargin)),

    // U5 — rollback semantics: drop rows created after L, null-out marks
    // after S (the un-spend rewrite).
    QueryDef("q_u5_rollback_rewrite",
      (s, d) => table(s, d, "events")
        .where(col("event_id") <= 800)
        .select(col("event_id"),
          when(col("event_id") > 400, lit(null).cast("long"))
            .otherwise(floor(col("value") * 100 + 0.5)).as("value_cents"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  CASE WHEN event_id > 400 THEN NULL
             |       ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS value_cents
             |FROM events WHERE event_id <= 800 ORDER BY event_id""".stripMargin)),

    // U1 — markInputs merge shape: left join a derived delta, coalesce marks.
    QueryDef("q_u1_mark_merge",
      (s, d) => {
        val ev = table(s, d, "events")
        val marks = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id").as("m_user"))
          .agg(min(col("event_id")).as("first_purchase"))
        ev.join(broadcast(marks), col("user_id") === col("m_user"), "left_outer")
          .select(col("event_id"), coalesce(col("first_purchase"), lit(-1L)).as("mark"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, COALESCE(m.first_purchase, -1) AS mark
             |FROM events e LEFT JOIN (
             |  SELECT user_id AS m_user, min(event_id) AS first_purchase
             |  FROM events WHERE event_type = 'purchase' GROUP BY user_id) m
             |ON e.user_id = m.m_user ORDER BY event_id""".stripMargin)),

    // S7 — INSERT OR IGNORE / PK dedup: one survivor per key, deterministic.
    QueryDef("q_s7_dedup_pk",
      (s, d) => table(s, d, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min(col("l_suppkey")).as("supp"), count(lit(1)).as("n"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, min(l_suppkey) AS supp, count(*) AS n
             |FROM lineitem GROUP BY l_orderkey, l_linenumber
             |ORDER BY l_orderkey, l_linenumber""".stripMargin))
  )
}
