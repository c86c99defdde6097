package graft

import graft.index.GraftIndex
import graft.ingest.Indexer
import graft.model.Pattern
import graft.streaming.Resume
import graft.streaming.Resume.{Point, Since}
import graft.tools.FixtureChain
import org.apache.spark.sql.functions._

/** Resume protocol (Configuration.hs:182-240 startOrResume + chain-sync
  * FindIntersect): candidate selection branches, and the headline property —
  * a crash in the MIDDLE of a rollback (inputs cut, checkpoints stale)
  * recovers to exactly the reference state after negotiation + replay. */
class ResumeSpec extends SparkSpec {

  private val patterns: Set[Pattern] = Set(Pattern.MatchAny(includingBootstrap = true))

  private def freshIx(name: String, blocks: Seq[FixtureChain.Blk]): GraftIndex = {
    val ix = new GraftIndex(spark, tmpDir(name))
    blocks.grouped(4).foreach(b => Indexer.ingest(ix, FixtureChain.toDf(spark, b), patterns))
    ix
  }

  test("startOrResume branches mirror the reference") {
    val empty = new GraftIndex(spark, tmpDir("graft-resume-empty"))
    intercept[Resume.NoStartingPointException] { Resume.startOrResume(empty) }
    // explicit point on an empty index: start there, no known point
    assert(Resume.startOrResume(empty, Since.FromPoint(Point(5L, "aa"))) ==
      (None, Seq(Point(5L, "aa"))))
    // tip on an empty index: fetched from the producer
    assert(Resume.startOrResume(empty, Since.FromTip, () => Point(9L, "bb")) ==
      (Some(Point(9L, "bb")), Seq(Point(9L, "bb"))))

    val ix = freshIx("graft-resume-branches", FixtureChain.chain(12))
    val (most, cands) = Resume.startOrResume(ix)
    assert(most.map(_.slot).contains(120L))
    assert(cands.map(_.slot) == cands.map(_.slot).sorted.reverse)
    // --since newer than every checkpoint: conflicting options
    intercept[Resume.ConflictingOptionsException] {
      Resume.startOrResume(ix, Since.FromPoint(Point(999L, "cc")))
    }
    // --since older: merged into the candidates, order kept newest-first
    val (_, merged) = Resume.startOrResume(ix, Since.FromPoint(Point(15L, "dd")))
    assert(merged.contains(Point(15L, "dd")))
    assert(merged.map(_.slot) == merged.map(_.slot).sorted.reverse)
    // FromTip with checkpoints resumes from checkpoints, no tip fetch
    val (m2, _) = Resume.startOrResume(ix, Since.FromTip)
    assert(m2.map(_.slot).contains(120L))
  }

  test("negotiate: no common point raises IntersectionNotFound") {
    val ix = freshIx("graft-resume-nointer", FixtureChain.chain(4))
    intercept[Resume.IntersectionNotFoundException] {
      Resume.resume(ix, _ => None)
    }
  }

  test("crash mid-rollback recovers to reference state via negotiation + replay") {
    val blocks = FixtureChain.chain(12) // slots 10..120
    val ix = freshIx("graft-resume-crash", blocks)

    // the producer reorged at slot 60 while we were down: its chain is the
    // original blocks ≤ 60 plus divergent 70'/80'
    val fork = Seq(
      FixtureChain.Blk(70L, FixtureChain.hex32(991070), Seq(
        FixtureChain.Tx(FixtureChain.hex32(992070), Nil,
          Seq(FixtureChain.Out(FixtureChain.baseAddr(1, 1), 7070L))))),
      FixtureChain.Blk(80L, FixtureChain.hex32(991080), Seq(
        FixtureChain.Tx(FixtureChain.hex32(992080),
          Seq((FixtureChain.hex32(992070), 0)),
          Seq(FixtureChain.Out(FixtureChain.baseAddr(2, 2), 8080L))))))
    val producerChain = blocks.filter(_.slot <= 60L) ++ fork
    val producerPoints = producerChain.map(b => Point(b.slot, b.headerHash)).toSet

    // CRASH MID-ROLLBACK to 60: rollbackTo mutates inputs, then spends,
    // then checkpoints — die after the first two. Reproduce that exact
    // half-state through the public segment API: inputs cut + un-spent,
    // spends delta cleared, checkpoints STALE (still reach 120).
    val keepSpend = col("spent_at").isNotNull && col("spent_at") <= 60L
    ix.replace("inputs", ix.inputsWithSpends.where(col("created_at") <= 60L)
      .withColumn("spent_by", when(keepSpend, col("spent_by")))
      .withColumn("spent_with", when(keepSpend, col("spent_with")))
      .withColumn("spent_at", when(keepSpend, col("spent_at"))))
    ix.replace("spends", ix.emptyOf("spends"))
    assert(ix.table("checkpoints").agg(max("slot_no")).head().getLong(0) == 120L)

    // restart: offer log-spaced checkpoints; the producer answers the newest
    // point on ITS chain (slot+hash must both match — stale post-60
    // checkpoints don't, and neither would a reorged-away hash)
    val intersection = Resume.resume(ix,
      candidates => candidates.find(producerPoints.contains))
    assert(intersection.slot <= 60L)
    // index aligned: nothing (created, spent, or checkpointed) past the
    // intersection survives
    assert(ix.table("checkpoints").agg(max("slot_no")).head().getLong(0) == intersection.slot)
    assert(ix.table("inputs").where(col("created_at") > intersection.slot).count() == 0)
    assert(ix.inputsWithSpends.where(col("spent_at") > intersection.slot).count() == 0)

    // replay the producer's chain from the intersection
    val replay = producerChain.filter(_.slot > intersection.slot)
    Indexer.ingest(ix, FixtureChain.toDf(spark, replay), patterns)

    // reference state: an index built from the producer's chain in one go
    val ref = freshIx("graft-resume-ref", producerChain)
    def state(i: GraftIndex) = i.inputsWithSpends
      .select("tx_id", "output_index", "created_at", "spent_at")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    assert(state(ix) == state(ref))
    def cps(i: GraftIndex) = i.table("checkpoints")
      .select("slot_no", "header_hash").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cps(ix) == cps(ref))
  }
}
