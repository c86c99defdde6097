package graft

import graft.index.{GraftIndex, Mutations}
import graft.ingest.Indexer
import graft.model.Pattern
import graft.query.{Api, FoldInputs}
import graft.tools.FixtureChain.{Blk, Out, Tx, baseAddr, hex32, toDf}

/** Model-based reorg testing — the rebuild of the reference's state-machine
  * suite (/root/reference/test/Test/Kupo/AppSpec.hs, test/README.md:11-17):
  * random roll-forward / roll-backward / GC sequences applied to both the
  * real index and a trivial in-memory model, states compared after every
  * mutation batch. Seeded → deterministic across runs. */
class ReorgPropertySpec extends SparkSpec {

  private case class MRow(txId: String, outputIndex: Int, address: String,
                          createdAt: Long, spentAt: Option[Long])

  private final class Model {
    var rows: Vector[MRow] = Vector.empty
    var checkpoints: Set[Long] = Set.empty

    /** `indexed` mirrors the active pattern set: only matching outputs become
      * rows, but spends are recorded against ANY existing row — exactly the
      * engine split (MatchBlock filters `produced` by pattern, `spends`
      * carries every consumed ref). */
    def ingest(blocks: Seq[Blk], indexed: String => Boolean = _ => true): Unit = {
      blocks.foreach { b =>
        checkpoints += b.slot
        b.txs.foreach { tx =>
          tx.outputs.zipWithIndex.foreach { case (o, i) =>
            if (indexed(o.address))
              rows :+= MRow(tx.id, i, o.address, b.slot, None)
          }
          tx.inputs.foreach { case (t, i) =>
            rows = rows.map(r =>
              if (r.txId == t && r.outputIndex == i && r.spentAt.isEmpty)
                r.copy(spentAt = Some(b.slot))
              else r)
          }
        }
      }
    }

    /** U6 putPatterns mirror: fresh rows for the new pattern from `since`
      * (PK-deduped, like the engine's anti-join), then spends replayed from
      * the canonical history — the engine's spends side-table already holds
      * every consumed ref, so a backfilled row picks its spend mark up
      * regardless of when the row was appended. */
    def backfill(history: Seq[Blk], since: Long, matches: String => Boolean): Unit = {
      history.filter(_.slot >= since).foreach { b =>
        b.txs.foreach { tx =>
          tx.outputs.zipWithIndex.foreach { case (o, i) =>
            if (matches(o.address) &&
                !rows.exists(r => r.txId == tx.id && r.outputIndex == i))
              rows :+= MRow(tx.id, i, o.address, b.slot, None)
          }
        }
      }
      history.foreach { b =>
        b.txs.foreach { tx =>
          tx.inputs.foreach { case (t, i) =>
            rows = rows.map(r =>
              if (r.txId == t && r.outputIndex == i && r.spentAt.isEmpty)
                r.copy(spentAt = Some(b.slot))
              else r)
          }
        }
      }
    }

    /** U5 invariants (SQLite.hs:799-819). */
    def rollback(s: Long): Unit = {
      rows = rows.filter(_.createdAt <= s)
        .map(r => if (r.spentAt.exists(_ > s)) r.copy(spentAt = None) else r)
      checkpoints = checkpoints.filter(_ <= s)
    }

    /** U3 (SQLite.hs:876-883). */
    def prune(longestRollback: Long): Unit =
      checkpoints.maxOption.foreach { tip =>
        rows = rows.filter(r => r.spentAt.forall(_ >= tip - longestRollback))
      }

    def state: Set[(String, Int, Long, Option[Long])] =
      rows.map(r => (r.txId, r.outputIndex, r.createdAt, r.spentAt)).toSet
  }

  /** Chain generator with reorg-aware state: spendable refs track rollbacks. */
  private final class Gen(seed: Long) {
    val rnd = new scala.util.Random(seed)
    var slot: Long = 0
    // (txId, outputIndex, createdAt, spent)
    var utxo: Vector[(String, Int, Long, Boolean)] = Vector.empty
    private var blkCounter = 0

    def nextBlocks(n: Int): Seq[Blk] = (0 until n).map { _ =>
      slot += 1 + rnd.nextInt(5)
      blkCounter += 1
      val txs = (0 to rnd.nextInt(2)).map { t =>
        val txId = hex32(seed.toInt * 100000 + blkCounter * 100 + t)
        val spendable = utxo.zipWithIndex.filter(!_._1._4)
        val spends =
          if (spendable.nonEmpty && rnd.nextBoolean()) {
            val (ref, at) = spendable(rnd.nextInt(spendable.size))
            utxo = utxo.updated(at, ref.copy(_4 = true))
            Seq((ref._1, ref._2))
          } else Nil
        val outs = (0 to rnd.nextInt(2)).map { o =>
          Out(baseAddr(rnd.nextInt(3), rnd.nextInt(2)), 1000L + o)
        }
        outs.indices.foreach(i => utxo :+= ((txId, i, slot, false)))
        Tx(txId, spends, outs)
      }
      Blk(slot, hex32(seed.toInt * 999 + blkCounter), txs)
    }

    def rollbackTo(s: Long): Unit = {
      // forget rows created after s; un-spend refs consumed after s: the
      // generator does not track spend slots, so conservatively mark nothing
      // un-spent (the engine and model both see the same replayed history)
      utxo = utxo.filter(_._3 <= s)
      slot = s
    }
  }

  private def engineState(ix: GraftIndex): Set[(String, Int, Long, Option[Long])] =
    ix.inputsWithSpends.select("tx_id", "output_index", "created_at", "spent_at")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  for (seed <- Seq(1L, 42L)) {
    test(s"random forward/rollback/GC sequence matches the model (seed=$seed)") {
      forwardRollbackGc(seed)
    }
  }
  // amplification: same property, one more seed — default run keeps two
  test("random forward/rollback/GC sequence matches the model (seed=2026)",
      HeavyTest) {
    forwardRollbackGc(2026L)
  }

  private def forwardRollbackGc(seed: Long): Unit = {
      val gen = new Gen(seed)
      val model = new Model
      // retention > 1 so every reorg can ALSO assert the time-travel
      // contract: a snapshot pinned immediately before the rollback must
      // read the exact pre-rollback state afterwards
      val ix = new GraftIndex(spark, tmpDir(s"graft-prop-$seed"), manifestRetention = 4)
      val patterns = Set[Pattern](Pattern.MatchAny(includingBootstrap = true))
      val rnd = new scala.util.Random(seed * 7)

      var checksRun = 0
      (0 until 18).foreach { step =>
        rnd.nextInt(10) match {
          case r if r <= 5 || gen.slot == 0 => // forward batch
            val blocks = gen.nextBlocks(1 + rnd.nextInt(3))
            Indexer.ingest(ix, toDf(spark, blocks), patterns)
            model.ingest(blocks)
          case r @ (6 | 7) => // reorg to a random earlier slot — case 7
            // compacts first, so rollback must un-bake spent marks from
            // inputs (the round-1 U5 bug path: compact → rollback)
            if (r == 7) ix.compact()
            val pinned = ix.asOf(ix.manifest.version)
            val pinnedBefore = pinned.map(engineState)
            val target = math.max(0L, gen.slot - (1 + rnd.nextInt(8)))
            Mutations.rollbackTo(ix, target)
            model.rollback(target)
            gen.rollbackTo(target)
            pinned.zip(pinnedBefore).foreach { case (p, st) =>
              assert(engineState(p) == st,
                s"pinned snapshot diverged under rollback at step $step (seed=$seed)")
            }
          case 8 => // GC spent rows outside the safe zone
            val k = 5L + rnd.nextInt(10)
            Mutations.pruneInputs(ix, k)
            model.prune(k)
          case 9 => // maintenance: full compaction, spends fold, or tiering
            rnd.nextInt(3) match {
              case 0 => ix.compact()
              case 1 => ix.compactSpends()
              case 2 => ix.compactSegments("inputs", maxSegments = 3)
            }
        }
        if (step % 3 == 2) { // compare state every few mutations
          assert(engineState(ix) == model.state, s"divergence at step $step (seed=$seed)")
          // API-during-churn (the reference's AppSpec interleaves READS with
          // the mutation stream, not only a final compare): foldInputs in
          // both status flavors, a random created_at-range fold, and the
          // count endpoint must all agree with the model MID-SEQUENCE
          def folded(q: Api.MatchesQuery): Set[(String, Int)] =
            FoldInputs(ix, q).select("transaction_id", "output_index")
              .collect().map(r => (r.getString(0), r.getInt(1))).toSet
          def modelSet(p: MRow => Boolean): Set[(String, Int)] =
            model.rows.filter(p).map(r => (r.txId, r.outputIndex)).toSet
          assert(folded(Api.MatchesQuery("*", status = Api.StatusFlag.OnlyUnspent))
            == modelSet(_.spentAt.isEmpty), s"unspent fold at step $step (seed=$seed)")
          assert(folded(Api.MatchesQuery("*", status = Api.StatusFlag.OnlySpent))
            == modelSet(_.spentAt.isDefined), s"spent fold at step $step (seed=$seed)")
          val (lo, hi) = { val a = rnd.nextLong(gen.slot + 1); (a, a + rnd.nextLong(10) + 1) }
          assert(folded(Api.MatchesQuery("*",
              range = Api.SlotRange(lowerBound = Some(lo), upperBound = Some(hi))))
            == modelSet(r => r.createdAt >= lo && r.createdAt <= hi),
            s"range [$lo,$hi] fold at step $step (seed=$seed)")
          assert(FoldInputs.countInputs(ix, "*") == model.rows.size.toLong,
            s"countInputs at step $step (seed=$seed)")
          // schema-v6 sidecar invariants UNDER the random mutation stream:
          // every live inputs segment stays sketched (coverage rides each
          // commit path — a hole here means some mutation forgot its
          // sidecar), and the bloom-pruned txid point lookup agrees with
          // the model for a present and an absent key (a false negative or
          // stale-path mixup would drop rows exactly here)
          val liveSegs = ix.manifest.tables.getOrElse("inputs", Nil).map(_.path).toSet
          val sketched = ix.table("segment_blooms")
            .where(org.apache.spark.sql.functions.col("table_name") === "inputs")
            .select("segment_path").collect().map(_.getString(0)).toSet
          assert(liveSegs.subsetOf(sketched),
            s"sidecar coverage hole at step $step (seed=$seed): ${liveSegs -- sketched}")
          (model.rows.headOption.map(_.txId).toSeq :+ ("e" * 64)).foreach { key =>
            assert(folded(Api.MatchesQuery(s"*@$key")) == modelSet(_.txId == key),
              s"txid point lookup for $key at step $step (seed=$seed)")
          }
          checksRun += 1
        }
      }
      assert(engineState(ix) == model.state)
      assert(checksRun >= 3)
      val maxCp = ix.table("checkpoints").agg(org.apache.spark.sql.functions.max("slot_no"))
        .head()
      val engineMax = if (maxCp.isNullAt(0)) None else Some(maxCp.getLong(0))
      assert(engineMax == model.checkpoints.maxOption)
  }

  // U6-in-the-loop: the reference's state machine also inserts/retires
  // patterns mid-sequence (AppSpec's pattern actions). Same model compare,
  // but the active set shifts under the mutation stream: ingest only indexes
  // matching outputs, putPatterns backfills the new pattern's history from a
  // random since-slot (occasionally as a full validated point), and
  // removePatterns retires one without touching its rows. 50 seeded
  // sequences, model asserted after EVERY step.
  test("pattern put/remove interleaved with forward/rollback/GC matches the model (6 seeds)") {
    patternInterleave(100L until 106L)
  }
  // amplification: the remaining 44 of the original 50 seeded sequences —
  // identical body, wider random sample (644 s of the default suite's wall
  // before the split; the 6-seed default keeps every action type covered)
  test("pattern put/remove interleaved with forward/rollback/GC matches the model (seeds 106-149)",
      HeavyTest) {
    patternInterleave(106L until 150L)
  }

  private def patternInterleave(seeds: Seq[Long]): Unit = {
    import graft.index.PatternManager
    val payCred = (0 to 2).map(s => s -> graft.tools.FixtureChain.hex28(2000 + s)).toMap
    def paySeedOf(addr: String): Int =
      (0 to 2).find(s => addr.endsWith(payCred(s))).get

    for (seed <- seeds) {
      val gen = new Gen(seed)
      val model = new Model
      val ix = new GraftIndex(spark, tmpDir(s"graft-prop-pat-$seed"))
      val rnd = new scala.util.Random(seed * 13)
      var active: Set[Int] = Set(0, 1)
      def activePatterns: Set[Pattern] = active.map(s => Pattern.MatchPayment(payCred(s)))
      Indexer.setPatterns(ix, activePatterns)
      var history: Vector[Blk] = Vector.empty

      (0 until 8).foreach { step =>
        rnd.nextInt(10) match {
          case r if r <= 4 || history.isEmpty => // forward batch, narrow patterns
            val blocks = gen.nextBlocks(1 + rnd.nextInt(3))
            history ++= blocks
            Indexer.ingest(ix, toDf(spark, blocks), activePatterns)
            model.ingest(blocks, a => active.contains(paySeedOf(a)))
          case 5 | 6 => // putPatterns with backfill from a random since-slot
            val cred = (0 to 2).find(!active.contains(_))
              .getOrElse(rnd.nextInt(3)) // re-put is idempotent
            val since = history(rnd.nextInt(history.size)).slot
            val point = // sometimes a full validated (slot, header_hash) point
              if (rnd.nextBoolean()) Some(history.find(_.slot == since).get.headerHash)
              else None
            PatternManager.putPatterns(ix, toDf(spark, history),
              Set[Pattern](Pattern.MatchPayment(payCred(cred))),
              since = since, sinceHeaderHash = point)
            // engine diffs already-active patterns out of the backfill set —
            // a re-put must NOT resurrect rows GC'd since (prune is final
            // for history the active set already covered)
            if (!active.contains(cred))
              model.backfill(history, since, a => paySeedOf(a) == cred)
            active += cred
            assert(PatternManager.listPatterns(ix).toSet == activePatterns,
              s"pattern set after put at step $step (seed=$seed)")
          case 7 => // retire a pattern: rows stay, future ingests skip it
            if (active.size > 1) {
              val cred = active.toSeq(rnd.nextInt(active.size))
              PatternManager.removePatterns(ix,
                Set[Pattern](Pattern.MatchPayment(payCred(cred))))
              active -= cred
              assert(PatternManager.listPatterns(ix).toSet == activePatterns,
                s"pattern set after remove at step $step (seed=$seed)")
            }
          case 8 => // reorg
            val target = math.max(0L, gen.slot - (1 + rnd.nextInt(8)))
            Mutations.rollbackTo(ix, target)
            model.rollback(target)
            gen.rollbackTo(target)
            history = history.filter(_.slot <= target)
          case 9 => // GC
            val k = 5L + rnd.nextInt(10)
            Mutations.pruneInputs(ix, k)
            model.prune(k)
        }
        assert(engineState(ix) == model.state,
          s"divergence at step $step (seed=$seed, active=$active)")
      }
    }
  }
}
