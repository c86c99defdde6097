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

  test("S1 wire plane: mux/chain-sync session bytes negotiate AND replay into runOnce") {
    import graft.codec.{Blake2b, Cbor, Hex}
    import graft.codec.Cbor._
    import graft.streaming.ChainSyncWire
    import graft.streaming.ChainSyncWire.{ChainSyncCodec => CS, Mux}

    // the producer's chain: era-wrapped Conway block CBOR (empty tx set —
    // every block still checkpoints), exactly what a node serves over n2c
    def mkCborBlk(slot: Long, seed: Int): (Point, Array[Byte]) = {
      val headerBody = cArr(cInt(5), cInt(slot), cBytes(Array.fill[Byte](32)(seed.toByte)))
      val header = cArr(headerBody, cBytes(Array.fill[Byte](8)(0x11.toByte)))
      val block = cArr(header, cArr(), cArr(), cMap(), cArr())
      (Point(slot, Hex.encode(Blake2b.hash256(Cbor.encode(header)))),
        Cbor.encode(cArr(cInt(6), block)))
    }
    val chain = Seq(mkCborBlk(31L, 1), mkCborBlk(47L, 2))
    val origin = Point(-1L, "origin")

    /** One full responder-side session over BYTES: negotiate from `cands`
      * (the repo's origin sentinel maps to the CBOR origin = no
      * candidates), serve every block after the intersection, AwaitReply
      * at tip. */
    def wireSession(cands0: Seq[Point]): (Option[Point], Seq[String]) = {
      val cands = cands0.filter(_.slot >= 0L)
      val tipItem = cArr(
        cArr(cInt(chain.last._1.slot), cBytes(Hex.decode(chain.last._1.headerHash).get)),
        cInt(chain.length.toLong))
      def reply(msg: CS.Msg, cursor: Int): (Array[Byte], Int) = msg match {
        case CS.FindIntersect(points) =>
          points.find(p => chain.exists(_._1 == p)) match {
            case Some(p) =>
              (Cbor.encode(cArr(cInt(5),
                cArr(cInt(p.slot), cBytes(Hex.decode(p.headerHash).get)), tipItem)),
                chain.indexWhere(_._1 == p) + 1)
            case None => // nothing in common: stream from origin
              (Cbor.encode(cArr(cInt(5), cArr(), tipItem)), 0)
          }
        case CS.RequestNext =>
          if (cursor < chain.length)
            (Cbor.encode(cArr(cInt(2), cTag(24, cBytes(chain(cursor)._2)), tipItem)),
              cursor + 1)
          else (Cbor.encode(cArr(cInt(1))), cursor) // AwaitReply: tip reached
        case other => sys.error(s"responder got $other")
      }
      val client = new ChainSyncWire.Client(cands)
      var outbound = client.start()
      var cursor = 0
      var negotiated: Option[Point] = None
      val lines = Seq.newBuilder[String]
      while (outbound.nonEmpty) {
        val (sdus, rest) = Mux.decode(outbound)
        assert(rest.isEmpty)
        var serverBytes = Array.emptyByteArray
        sdus.foreach { sdu =>
          val (r, c2) = reply(CS.decode(Cbor.decode(sdu.payload)), cursor)
          cursor = c2
          serverBytes = serverBytes ++
            Mux.encode(Mux.Sdu(0L, CS.ProtocolId, responder = true, r))
        }
        val (events, next) = client.onBytes(serverBytes)
        events.foreach {
          case ChainSyncWire.Negotiated(p, _) => negotiated = p
          case ChainSyncWire.Forwarded(b, _) =>
            lines += graft.ingest.BlockCbor.blockToOgmios(Hex.encode(b))
          case other => fail(s"unexpected event $other")
        }
        outbound = next
      }
      (negotiated, lines.result())
    }

    val inputDir = tmpDir("graft-wire-in")
    val ix = new GraftIndex(spark, tmpDir("graft-wire-ix"))
    val (i1, h1) = Node.runOnce(spark, inputDir, ix, patterns,
      findIntersect = cands => wireSession(cands)._1.orElse(Some(origin)),
      since = Since.FromPoint(origin),
      startFeeder = p => {
        val lines = wireSession(if (p == origin) Nil else Seq(p))._2
        Files.write(Paths.get(inputDir, "000.jsonl"),
          lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      },
      nodeTip = Some(47L))
    assert(i1 == origin)
    assert(h1.mostRecentCheckpoint.map(_._1).contains(47L))
    val cps = ix.table("checkpoints").select("slot_no", "header_hash")
      .collect().map(r => Point(r.getLong(0), r.getString(1))).toSet
    assert(chain.map(_._1).toSet.subsetOf(cps),
      s"wire-served blocks missing from the index: $cps")

    // a second turn negotiates ON the wire-indexed points and drains nothing
    val (i2, h2) = Node.runOnce(spark, inputDir, ix, patterns,
      findIntersect = cands => wireSession(cands)._1.orElse(Some(origin)),
      startFeeder = p => {
        val lines = wireSession(Seq(p))._2
        if (lines.nonEmpty)
          Files.write(Paths.get(inputDir, "001.jsonl"),
            lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      },
      nodeTip = Some(47L))
    assert(i2 == chain.last._1, s"renegotiation should land on the wire tip: $i2")
    assert(h2.mostRecentCheckpoint.map(_._1).contains(47L))
  }
}
