package graft

import graft.index.{GraftIndex, PatternManager}
import graft.ingest.Indexer
import graft.model.Pattern
import graft.tools.FixtureChain
import org.apache.spark.sql.functions._

/** U6 pattern management + R10 checkpoint-by-slot. */
class PatternManagerSpec extends SparkSpec {

  private lazy val blocks = FixtureChain.chain(12)
  private def blocksDf = FixtureChain.toDf(spark, blocks)

  private val delCred0 = FixtureChain.baseAddr(0, 0).substring(2, 58)
  private val delPattern = Pattern.fromText(s"*/$delCred0").get

  test("putPatterns backfills history for the new pattern only, idempotently") {
    val ix = new GraftIndex(spark, tmpDir("graft-pm"))
    Indexer.setPatterns(ix, Set(delPattern))
    Indexer.ingest(ix, blocksDf, Set(delPattern))
    val before = ix.table("inputs").count()
    assert(before > 0)

    // add the wildcard pattern with backfill from genesis
    PatternManager.putPatterns(ix, blocksDf, Set[Pattern](Pattern.MatchAny(true)),
      since = 0L, longestRollback = 1000000L)
    val after = ix.table("inputs").count()
    assert(after > before)
    // no PK duplicates: the anti-join excluded already-matched rows
    assert(after == ix.table("inputs").dropDuplicates("tx_id", "output_index").count())
    // total equals a from-scratch wildcard index
    val ix2 = new GraftIndex(spark, tmpDir("graft-pm2"))
    Indexer.ingest(ix2, blocksDf, Set[Pattern](Pattern.MatchAny(true)))
    assert(after == ix2.table("inputs").count())
    // pattern set now holds both
    assert(PatternManager.currentPatterns(ix) == Set(delPattern, Pattern.MatchAny(true)))
  }

  test("putPatterns enforces the safe zone unless unsafe is allowed") {
    val ix = new GraftIndex(spark, tmpDir("graft-pm-safe"))
    Indexer.ingest(ix, blocksDf, Set[Pattern](Pattern.MatchAny(true)))
    val tip = ix.table("checkpoints").agg(max("slot_no")).head().getLong(0)
    intercept[PatternManager.SafeZoneViolation] {
      PatternManager.putPatterns(ix, blocksDf, Set(delPattern),
        since = 0L, longestRollback = tip / 2)
    }
    PatternManager.putPatterns(ix, blocksDf, Set(delPattern),
      since = 0L, longestRollback = tip / 2, allowUnsafe = true)
    assert(PatternManager.currentPatterns(ix).contains(delPattern))
  }

  test("putPatterns validates a full since-point against known checkpoints") {
    val ix = new GraftIndex(spark, tmpDir("graft-pm-point"))
    Indexer.ingest(ix, blocksDf, Set[Pattern](Pattern.MatchAny(true)))
    val cp = ix.table("checkpoints").orderBy(col("slot_no")).head()
    val (slot, hash) = (cp.getLong(0), cp.getString(1))
    // exact point: accepted
    PatternManager.putPatterns(ix, blocksDf, Set(delPattern),
      since = slot, allowUnsafe = true, sinceHeaderHash = Some(hash))
    // unknown slot → ErrPointNotFound analogue
    intercept[PatternManager.PointNotFound] {
      PatternManager.putPatterns(ix, blocksDf, Set(delPattern),
        since = slot + 1, allowUnsafe = true, sinceHeaderHash = Some(hash))
    }
    // wrong header hash → ErrPointMismatch analogue
    intercept[PatternManager.PointMismatch] {
      PatternManager.putPatterns(ix, blocksDf, Set(delPattern),
        since = slot, allowUnsafe = true, sinceHeaderHash = Some("ff" * 32))
    }
  }

  test("deleteMatches refuses overlapping patterns, deletes otherwise") {
    val ix = new GraftIndex(spark, tmpDir("graft-pm-del"))
    Indexer.setPatterns(ix, Set(delPattern))
    Indexer.ingest(ix, blocksDf, Set[Pattern](Pattern.MatchAny(true)))

    // delegation pattern overlaps the active set (it IS the active pattern)
    assert(PatternManager.deleteMatches(ix, delPattern).isLeft)

    // a non-overlapping pattern deletes its rows
    val otherCred = FixtureChain.baseAddr(1, 1).substring(2, 58)
    val other = Pattern.fromText(s"*/$otherCred").get
    if (!other.overlaps(Set[Pattern](delPattern))) {
      val n = PatternManager.deleteMatches(ix, other)
      assert(n.isRight && n.toOption.get >= 0)
    }

    // retiring the pattern then allows deletion
    PatternManager.removePatterns(ix, Set[Pattern](delPattern))
    val deleted = PatternManager.deleteMatches(ix, delPattern)
    assert(deleted.isRight && deleted.toOption.get > 0)
    assert(ix.table("inputs").where(delPattern.toPredicate).count() == 0)
  }

  test("R10 getCheckpointBySlot: closest ancestor vs strict") {
    val ix = new GraftIndex(spark, tmpDir("graft-pm-cp"))
    Indexer.ingest(ix, blocksDf, Set[Pattern](Pattern.MatchAny(true)))
    val slots = ix.table("checkpoints").select("slot_no")
      .collect().map(_.getLong(0)).sorted
    val present = slots.last
    val gap = present + 1 // no checkpoint at tip+1

    assert(PatternManager.getCheckpointBySlot(ix, present).map(_._1).contains(present))
    assert(PatternManager.getCheckpointBySlot(ix, gap).map(_._1).contains(present))
    assert(PatternManager.getCheckpointBySlot(ix, present, strict = true).isDefined)
    assert(PatternManager.getCheckpointBySlot(ix, gap, strict = true).isEmpty)
    assert(PatternManager.getCheckpointBySlot(ix, slots.head - 1).isEmpty)
  }
}
