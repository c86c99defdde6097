package graft

import graft.index.GraftIndex
import graft.ingest.Indexer
import graft.model.Pattern
import graft.query.{Api, FoldInputs}
import graft.tools.FixtureChain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col

/** Plan-shape regression gates for the kupo-side read path — the FoldInputs
  * counterpart of the LLM rehearsal's plan assertions. These pin the scale
  * CONTRACT stated in FoldInputs' scaladoc, not row results (every query
  * here also has an oracle row): pattern/range predicates must reach the
  * parquet scan as PushedFilters, manifest stats must prune segments before
  * Spark ever lists them, the F4 checkpoint joins must read only their two
  * columns, the OnlyUnspent dead join must stay eliminated, and no headline
  * plan may contain a cartesian or nested-loop join. A regression in any of
  * these keeps results correct at sf0.01 while silently turning a 100 TB
  * point query into a full scan — exactly the class of break the oracle gate
  * cannot see. Assertions run on `sparkPlan` (the pre-AQE physical plan):
  * what static planning chooses from parquet stats is the portable part;
  * AQE only improves on it at runtime. */
class PlanShapeSpec extends SparkSpec {
  import Api._

  private val patterns: Set[Pattern] = Set(Pattern.MatchAny(includingBootstrap = false))

  // 3 micro-batches of 4 blocks → 3+ slot-ranged inputs segments, so the
  // range-pruning assertion has segments to drop
  private lazy val ix: GraftIndex = {
    val g = new GraftIndex(spark, tmpDir("graft-planshape"))
    FixtureChain.chain(12).grouped(4).foreach { b =>
      Indexer.ingest(g, FixtureChain.toDf(spark, b), patterns)
    }
    g
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }
  private def scanOf(df: DataFrame, table: String): Seq[FileSourceScanExec] =
    scans(df).filter(_.relation.location.rootPaths.exists(_.toString.contains(s"/$table/")))
  private def pushed(s: FileSourceScanExec): String =
    s.metadata.getOrElse("PushedFilters", "")

  test("P3 exact address: the equality reaches the parquet scan (bloom/dict row-group skip feeds off it)") {
    val addr = ix.table("inputs").select("address").head().getString(0)
    val df = FoldInputs(ix, MatchesQuery(Pattern.MatchExact(addr).toText))
    val inputScans = scanOf(df, "inputs")
    assert(inputScans.nonEmpty)
    assert(inputScans.exists(s => pushed(s).contains(s"EqualTo(address,$addr)")),
      inputScans.map(pushed))
  }

  test("P6 payment/delegation: prefix and suffix predicates push down") {
    val pay = FixtureChain.baseAddr(0, 0).takeRight(56)
    val del = FixtureChain.baseAddr(0, 0).slice(2, 58)
    val df = FoldInputs(ix, MatchesQuery(s"$pay/$del"))
    val p = scanOf(df, "inputs").map(pushed)
    assert(p.exists(_.contains(s"StringStartsWith(address,01$del)")), p)
    assert(p.exists(_.contains(s"StringEndsWith(address,$pay)")), p)
  }

  test("P8 outref: both point-lookup equalities push down (tx_id is the bloomed key)") {
    val txid = ix.table("inputs").select("tx_id").head().getString(0)
    val df = FoldInputs(ix, MatchesQuery(s"0@$txid"))
    val p = scanOf(df, "inputs").map(pushed)
    assert(p.exists(s => s.contains(s"EqualTo(tx_id,$txid)") && s.contains("EqualTo(output_index,0)")), p)
  }

  test("F2 slot range: bounds push down AND the manifest prunes segments before Spark lists them") {
    val full = FoldInputs(ix, MatchesQuery("*"))
    val ranged = FoldInputs(ix,
      MatchesQuery("*", range = SlotRange(lowerBound = Some(10L), upperBound = Some(40L))))
    val p = scanOf(ranged, "inputs").map(pushed)
    assert(p.exists(s => s.contains("GreaterThanOrEqual(created_at,10)") &&
      s.contains("LessThanOrEqual(created_at,40)")), p)
    // segment pruning is MANIFEST-level: the ranged scan is built over fewer
    // segment roots, not merely filtered post-listing (at 100 TB the listing
    // itself is the cost)
    def segRoots(df: DataFrame) =
      scanOf(df, "inputs").flatMap(_.relation.location.rootPaths.map(_.toString))
        .filter(_.contains("/inputs/")).toSet
    assert(segRoots(ranged).size < segRoots(full).size,
      s"ranged=${segRoots(ranged).size} full=${segRoots(full).size}")
  }

  test("F4 checkpoint joins: two-column read schema; OnlyUnspent eliminates the dead spent join") {
    val both = FoldInputs(ix, MatchesQuery("*"))
    val cpScans = scanOf(both, "checkpoints")
    assert(cpScans.size == 2, s"expected created+spent checkpoint scans, got ${cpScans.size}")
    cpScans.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet == Set("slot_no", "header_hash"),
        s.requiredSchema.fieldNames.toSeq)
    }
    val unspent = FoldInputs(ix, MatchesQuery("*", status = StatusFlag.OnlyUnspent))
    assert(scanOf(unspent, "checkpoints").size == 1,
      "OnlyUnspent must skip the provably-empty spent-checkpoint join")
  }

  test("P9 policy window: the policies side table prunes inputs segments; no side table = no pruning, same answer") {
    import FixtureChain._
    val g = new GraftIndex(spark, tmpDir("graft-polwin"))
    val polA = hex28(50)
    // the policy is carried ONLY by the early batch: its slot window must
    // exclude the late segment from the scan entirely
    val early = Seq(Blk(10L, hex32(1), Seq(
      Tx(hex32(10), Nil, Seq(Out(baseAddr(0, 0), 5L, Map(polA -> Map("aa" -> 1L))))))))
    val late = Seq(Blk(1000L, hex32(2), Seq(
      Tx(hex32(20), Nil, Seq(Out(baseAddr(1, 0), 6L))))))
    Indexer.ingest(g, FixtureChain.toDf(spark, early), patterns)
    Indexer.ingest(g, FixtureChain.toDf(spark, late), patterns)

    val df = FoldInputs(g, MatchesQuery(Pattern.MatchPolicyId(polA).toText))
    val pruned = scanOf(df, "inputs")
      .flatMap(_.relation.location.rootPaths.map(_.toString)).filter(_.contains("/inputs/")).toSet
    val total = g.manifest.tables("inputs").size
    assert(total >= 2, s"fixture needs >= 2 inputs segments, got $total")
    assert(pruned.size < total, s"policy window should prune: scan=$pruned of $total segments")
    assert(df.count() == 1)
    // provably-absent policy: empty window, empty scan, empty result
    assert(FoldInputs(g, MatchesQuery(Pattern.MatchPolicyId("ff" * 28).toText)).count() == 0)
    // an index WITHOUT the side table (populated via replace) derives no
    // window — full scan, identical answer: pruning, never filtering
    val bare = new GraftIndex(spark, tmpDir("graft-polwin-bare"))
    bare.replace("inputs", g.table("inputs"))
    bare.replace("checkpoints", g.table("checkpoints"))
    assert(FoldInputs(bare, MatchesQuery(Pattern.MatchPolicyId(polA).toText)).count() == 1)
  }

  test("P3/P4 address window: address_stats prunes inputs segments; absent and windowed-range answers stay exact") {
    import FixtureChain._
    val g = new GraftIndex(spark, tmpDir("graft-addrwin"))
    // baseAddr(7, 7) appears ONLY in the early batch; baseAddr(8, 8) only late
    val early = Seq(Blk(10L, hex32(31), Seq(
      Tx(hex32(310), Nil, Seq(Out(baseAddr(7, 7), 5L))))))
    val late = Seq(Blk(1000L, hex32(32), Seq(
      Tx(hex32(320), Nil, Seq(Out(baseAddr(8, 8), 6L))))))
    Indexer.ingest(g, FixtureChain.toDf(spark, early), patterns)
    Indexer.ingest(g, FixtureChain.toDf(spark, late), patterns)

    def segRoots(df: org.apache.spark.sql.DataFrame) =
      scanOf(df, "inputs").flatMap(_.relation.location.rootPaths.map(_.toString))
        .filter(_.contains("/inputs/")).toSet
    val total = g.manifest.tables("inputs").size
    assert(total >= 2)

    // P3 exact: the early address's window excludes the late segment
    val exact = FoldInputs(g, MatchesQuery(Pattern.MatchExact(baseAddr(7, 7)).toText))
    assert(segRoots(exact).size < total, s"exact-address window should prune of $total")
    assert(exact.count() == 1)
    // P4 payment credential (suffix predicate — min/max could never prune
    // it; only the stats-table window can): same pruning, same answer
    val payCred = baseAddr(7, 7).takeRight(56)
    val pay = FoldInputs(g, MatchesQuery(s"$payCred/*"))
    assert(segRoots(pay).size < total, "payment-credential window should prune")
    assert(pay.count() == 1)
    // absent address (valid shape, never ingested): provably-empty window,
    // empty result
    assert(FoldInputs(g, MatchesQuery(Pattern.MatchExact(baseAddr(9, 9)).toText))
      .count() == 0)
    // window COMPOSES with a user range that excludes the row: still empty
    assert(FoldInputs(g, MatchesQuery(Pattern.MatchExact(baseAddr(7, 7)).toText,
      range = SlotRange(lowerBound = Some(500L)))).count() == 0)
  }

  test("P7/P8 txid point: the segment_blooms sidecar prunes segments; absent key = zero segments; answer identical to the full scan") {
    def segRoots(df: org.apache.spark.sql.DataFrame) =
      scanOf(df, "inputs").flatMap(_.relation.location.rootPaths.map(_.toString))
        .filter(_.contains("/inputs/")).toSet
    val m = ix.manifest
    val inputSegs = m.tables("inputs").map(_.path).toSet
    assert(inputSegs.size >= 3, s"fixture should have >= 3 inputs segments")
    // COVERAGE INVARIANT: every live segment of a point-indexed table has a
    // sidecar row (the sidecar rides the same atomic bump as the segment)
    val covered = ix.table("segment_blooms")
      .where(col("table_name") === "inputs")
      .select("segment_path").collect().map(_.getString(0)).toSet
    assert(inputSegs.subsetOf(covered), s"uncovered: ${inputSegs -- covered}")

    // a txid from the newest slot lives in exactly one segment: the probe
    // must schedule fewer segments than the manifest holds (a bloom false
    // positive could keep one extra — never all of them)
    val txid = ix.table("inputs").orderBy(col("created_at").desc)
      .select("tx_id").head().getString(0)
    val point = FoldInputs(ix, MatchesQuery(s"*@$txid"))
    assert(segRoots(point).size < inputSegs.size,
      s"bloom prune should drop segments: ${segRoots(point).size} of ${inputSegs.size}")
    // identical answer to the unpruned predicate (pruning, never filtering)
    assert(point.count() ==
      ix.inputsWithSpends.where(col("tx_id") === txid).count())
    // provably-absent key: every segment pruned, zero file scans, empty
    val absent = FoldInputs(ix, MatchesQuery(s"*@${"f" * 64}"))
    assert(scanOf(absent, "inputs").isEmpty, "absent key must scan nothing")
    assert(absent.count() == 0)
  }

  test("SpentAt range: the policy window AND the spent upper bound prune segments the spent stats alone keep") {
    import FixtureChain._
    val g = new GraftIndex(spark, tmpDir("graft-spentwin"))
    val polA = hex28(60)
    // seg1 (slot 10): the ONLY polA row; spent later at 500
    // seg2 (slot 500): spends seg1's row, creates a plain row; spent at 1000
    // seg3 (slot 1000): spends seg2's row, creates a plain row (never spent)
    val b1 = Seq(Blk(10L, hex32(41), Seq(
      Tx(hex32(410), Nil, Seq(Out(baseAddr(0, 0), 5L, Map(polA -> Map("aa" -> 1L))))))))
    val b2 = Seq(Blk(500L, hex32(42), Seq(
      Tx(hex32(420), Seq((hex32(410), 0)), Seq(Out(baseAddr(1, 0), 6L))))))
    val b3 = Seq(Blk(1000L, hex32(43), Seq(
      Tx(hex32(430), Seq((hex32(420), 0)), Seq(Out(baseAddr(2, 0), 7L))))))
    // bake marks in per batch: compactSpends merges ALL touched segments
    // into one rewrite, so compacting after each spend keeps the spent
    // segments distinct (each round's marks target one earlier segment)
    Seq(b1, b2, b3).foreach { b =>
      Indexer.ingest(g, FixtureChain.toDf(spark, b), patterns)
      g.compactSpends()
    }
    assert(g.manifest.tables("spends").isEmpty)
    val total = g.manifest.tables("inputs").size
    assert(total >= 3, s"fixture needs >= 3 inputs segments, got $total")

    def segRoots(df: DataFrame) =
      scanOf(df, "inputs").flatMap(_.relation.location.rootPaths.map(_.toString))
        .filter(_.contains("/inputs/")).toSet
    // policy + ?spent_after: spent stats keep BOTH spent segments (max
    // spent 500 and 1000 >= 100); the v4 created-window [10,10] must then
    // drop the second — the BASELINE.md `policy + spent range` shape walks
    // both indexes, not every recently-spent segment
    val q = FoldInputs(g, MatchesQuery(Pattern.MatchPolicyId(polA).toText,
      range = SlotRange(field = RangeField.SpentAt, lowerBound = Some(100L))))
    assert(segRoots(q).size == 1, s"window should cut the spent-stat set to 1: ${segRoots(q)}")
    assert(q.count() == 1)
    // unscoped pattern + spent UPPER bound: a row is created no later than
    // it is spent, so created-stat pruning on the bound alone drops the
    // last segment (created 1000 > 600) — no side-table window needed
    val hi = FoldInputs(g, MatchesQuery("*",
      range = SlotRange(field = RangeField.SpentAt, upperBound = Some(600L))))
    assert(segRoots(hi).size < total, s"spent-hi should prune created-late segments: ${segRoots(hi)}")
    assert(hi.count() == 1) // only the polA row was spent at <= 600
    // pruning never filters: the full-scan answer agrees
    assert(hi.count() == g.inputsWithSpends
      .where(col("spent_at").isNotNull && col("spent_at") <= 600L).count())
  }

  test("a FoldInputs query reads the manifest exactly once (pinned snapshot per query)") {
    // at 10⁵ segments the manifest is multi-MB — per-query read count is a
    // scale budget. The pinned facade also closes the cross-table race: a
    // commit landing mid-construction can no longer mix two index versions
    // (window from v+1, scan from v) in one answer. Own index + per-root
    // counter → immune to suites running in parallel in this JVM.
    val g = new GraftIndex(spark, tmpDir("graft-onepin"))
    Indexer.ingest(g, FixtureChain.toDf(spark, FixtureChain.chain(8)), patterns)
    val root = g.root
    // the counter is a test seam, off in production — opt in before the
    // first snapshot (deltas below are unaffected by the late start)
    graft.index.GraftIndex.Manifest.trackReads = true
    def reads = graft.index.GraftIndex.Manifest.readsOf(root)
    val before = reads
    val df = FoldInputs(g, MatchesQuery("*", resolveHashes = true))
    val built = reads
    assert(built - before == 1, s"plan construction read the manifest ${built - before}x")
    df.count()
    assert(reads == built, "execution must not re-read the manifest")
    // the window-probing shape (policy pattern) stays at one read too
    val before2 = reads
    FoldInputs(g, MatchesQuery(s"${"0" * 55}2.*")).count()
    assert(reads - before2 == 1, s"policy-window query read the manifest ${reads - before2}x")
  }

  test("headline plans: no cartesian or nested-loop join; fixture-scale dims broadcast") {
    val shapes = Seq(
      FoldInputs(ix, MatchesQuery("*", resolveHashes = true)),
      FoldInputs(ix, MatchesQuery("*", status = StatusFlag.OnlyUnspent)),
      FoldInputs(ix, MatchesQuery(s"0@${ix.table("inputs").select("tx_id").head().getString(0)}")))
    shapes.foreach { df =>
      val plan = df.queryExecution.sparkPlan.toString
      assert(!plan.contains("CartesianProduct"), "cartesian product in a headline plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in a headline plan")
    }
    // the resolve_hashes shape joins checkpoints + binary_data + scripts:
    // at fixture scale every dim is under the threshold, so the STATS-based
    // planner must pick broadcast for all of them — if this degrades to a
    // shuffle join here, the threshold gating the scaladoc promises is broken
    val resolved = FoldInputs(ix, MatchesQuery("*", resolveHashes = true))
    val plan = resolved.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins at fixture scale")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "a fixture-scale dim fell off the broadcast threshold")
  }
}
