package graft

import graft.index.GraftIndex
import graft.model.Pattern
import graft.query.Health
import graft.streaming.{Node, Resume}
import graft.streaming.Resume.{Point, Since}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The runNode-style lifecycle: boot (negotiate from --since) → stream
  * drain → health; then CRASH MID-ROLLBACK while the producer reorgs →
  * re-enter the same loop → negotiation + replay reconverge to the
  * reference state and health reflects the recovered tip. */
class NodeSpec extends SparkSpec {

  private val patterns: Set[Pattern] = Set(Pattern.MatchAny(includingBootstrap = true))
  private val addr = {
    val onChain = "01" + ("11" * 28) + ("22" * 28)
    graft.codec.Bech32.encode("addr", graft.codec.Hex.decode(onChain).get)
  }

  private case class Blk(slot: Long, hash: String, txId: String)
  private def fwdJson(b: Blk): String =
    s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"forward",""" +
      s""""block":{"id":"${b.hash}","slot":${b.slot},"transactions":[""" +
      s"""{"id":"${b.txId}","spends":"inputs","inputs":[],""" +
      s""""outputs":[{"address":"$addr","value":{"ada":{"lovelace":${b.slot * 10}}}}]}]},""" +
      s""""tip":{"slot":999,"id":"${"0" * 64}"}}}"""

  private def mkBlk(slot: Long, seed: Int) =
    Blk(slot, f"$seed%064d", f"${seed + 5000}%064d")

  test("boot → drain → health; crash mid-rollback + reorg → resume reconverges") {
    val chainA = (1 to 12).map(i => mkBlk(10L * i, i)) // slots 10..120
    val origin = Point(-1L, "origin")

    val inputDir = tmpDir("graft-node-in")
    val ix = new GraftIndex(spark, tmpDir("graft-node-ix"))

    // ---- first boot: --since origin, feeder replays the whole chain ----
    val aPoints = chainA.map(b => Point(b.slot, b.hash)).toSet + origin
    val (i1, h1) = Node.runOnce(spark, inputDir, ix, patterns,
      findIntersect = cands => cands.find(aPoints.contains),
      since = Since.FromPoint(origin),
      startFeeder = p => Files.write(Paths.get(inputDir, "000.jsonl"),
        chainA.filter(_.slot > p.slot).map(fwdJson).mkString("\n")
          .getBytes(StandardCharsets.UTF_8)),
      nodeTip = Some(120L), lastBlockAtMs = Some(0L), nowMs = 120L * 1000L,
      params = Some(Health.NetworkParameters.fromMagic(networkMagic = 2L, systemStartSec = 0L)))
    assert(i1 == origin)
    assert(h1.connectionStatus == Health.ConnectionStatus.Connected)
    assert(h1.mostRecentCheckpoint.map(_._1).contains(120L))
    // tip within the 120 s tolerance of the wall clock → fully synchronized
    assert(h1.networkSynchronization.contains("1.00000"))

    // ---- crash MID-ROLLBACK to 60 (same half-state as ResumeSpec): ----
    // inputs cut + un-spent, spends delta cleared, checkpoints STALE
    val keepSpend = col("spent_at").isNotNull && col("spent_at") <= 60L
    ix.replace("inputs", ix.inputsWithSpends.where(col("created_at") <= 60L)
      .withColumn("spent_by", when(keepSpend, col("spent_by")))
      .withColumn("spent_with", when(keepSpend, col("spent_with")))
      .withColumn("spent_at", when(keepSpend, col("spent_at"))))
    ix.replace("spends", ix.emptyOf("spends"))
    assert(ix.table("checkpoints").agg(max("slot_no")).head().getLong(0) == 120L)

    // meanwhile the producer reorged at 60: its chain is ≤60 + fork 70'/80'
    val fork = Seq(mkBlk(70L, 9070), mkBlk(80L, 9080))
    val chainB = chainA.filter(_.slot <= 60L) ++ fork
    val bPoints = chainB.map(b => Point(b.slot, b.hash)).toSet + origin

    // ---- re-enter the SAME loop: negotiate, align, replay, health ----
    val (i2, h2) = Node.runOnce(spark, inputDir, ix, patterns,
      findIntersect = cands => cands.find(bPoints.contains),
      startFeeder = p => Files.write(Paths.get(inputDir, "001.jsonl"),
        chainB.filter(_.slot > p.slot).map(fwdJson).mkString("\n")
          .getBytes(StandardCharsets.UTF_8)),
      nodeTip = Some(80L))
    // stale post-60 checkpoints don't intersect the producer's chain
    assert(i2.slot <= 60L)
    assert(h2.mostRecentCheckpoint.map(_._1).contains(80L))
    assert(Health.etag(h2).contains(fork.last.hash))

    // reference: a fresh node that saw the producer's final chain in one go
    val refDir = tmpDir("graft-node-refin")
    val refIx = new GraftIndex(spark, tmpDir("graft-node-refix"))
    val (_, hr) = Node.runOnce(spark, refDir, refIx, patterns,
      findIntersect = cands => cands.find(bPoints.contains),
      since = Since.FromPoint(origin),
      startFeeder = p => Files.write(Paths.get(refDir, "000.jsonl"),
        chainB.filter(_.slot > p.slot).map(fwdJson).mkString("\n")
          .getBytes(StandardCharsets.UTF_8)))
    def state(i: GraftIndex) = (
      i.inputsWithSpends
        .select("tx_id", "output_index", "created_at", "spent_at")
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet,
      i.table("checkpoints").select("slot_no", "header_hash")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    assert(state(ix) == state(refIx), "recovered state diverged from reference")
    assert(h2.mostRecentCheckpoint == hr.mostRecentCheckpoint)

    // a second drain with nothing pending is a no-op (idempotent loop turn)
    val (i3, h3) = Node.runOnce(spark, inputDir, ix, patterns,
      findIntersect = cands => cands.find(bPoints.contains),
      nodeTip = Some(80L))
    assert(i3.slot == 80L && h3.mostRecentCheckpoint.map(_._1).contains(80L))
    assert(state(ix) == state(refIx))
  }

  test("boot on an empty index without --since raises NoStartingPoint") {
    val ix = new GraftIndex(spark, tmpDir("graft-node-nosince"))
    intercept[Resume.NoStartingPointException] {
      Node.runOnce(spark, tmpDir("graft-node-nosince-in"), ix, patterns,
        findIntersect = _.headOption)
    }
  }
}
