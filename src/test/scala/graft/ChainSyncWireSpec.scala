package graft

import graft.codec.{Blake2b, Cbor, Hex}
import graft.codec.Cbor._
import graft.streaming.ChainSyncWire
import graft.streaming.ChainSyncWire.{ChainSyncCodec => CS, Handshake, Mux}
import graft.streaming.Resume.Point
import org.scalatest.funsuite.AnyFunSuite

/** The node-to-client wire protocol, driven without a socket: CBOR
  * encoder/decoder round-trips, mux SDU framing under adversarial
  * chunking, handshake propose/accept/refuse, and a full chain-sync
  * session whose roll-forward payload feeds the existing block data plane
  * (BlockCbor) — the same layering kupo gets from ouroboros-network. */
class ChainSyncWireSpec extends AnyFunSuite {

  // ---- CBOR encoder ----

  test("Cbor.encode: canonical round-trips through the reader, shortest heads") {
    val samples: Seq[Item] = Seq(
      cInt(0), cInt(23), cInt(24), cInt(255), cInt(256), cInt(65535),
      cInt(65536), cInt(BigInt("4294967295")), cInt(BigInt("4294967296")),
      cInt(-1), cInt(-24), cInt(-25), cInt(-256), cInt(BigInt("-4294967297")),
      cBytes(Array[Byte](1, 2, 3)), cBytes(Array.fill[Byte](300)(7)),
      cText(""), cText("héllo"), cBool(true), cBool(false),
      cArr(), cArr(cInt(1), cArr(cText("x")), cTag(24, cBytes(Array[Byte](9)))),
      cMap(cInt(1) -> cText("a"), cText("k") -> cArr(cInt(2))))
    samples.foreach { item =>
      val enc = Cbor.encode(item)
      val back = Cbor.decode(enc)
      // re-encoding the decoded form must reproduce the bytes (canonical)
      assert(Cbor.encode(back).toSeq == enc.toSeq, s"non-canonical for $item")
    }
    // shortest-form heads at the boundaries
    assert(Cbor.encode(cInt(23)).toSeq == Seq(0x17.toByte))
    assert(Cbor.encode(cInt(24)).toSeq == Seq(0x18.toByte, 24.toByte))
    assert(Cbor.encode(cInt(256)).toSeq == Seq(0x19.toByte, 1.toByte, 0.toByte))
    assert(Cbor.encode(cBool(true)).toSeq == Seq(0xf5.toByte))
    // the decoder's own golden: encode(decode(x)) == x for a protocol shape
    val wire = Cbor.encode(cArr(cInt(4), cArr(cArr(cInt(77), cBytes(Array.fill[Byte](32)(1))))))
    assert(Cbor.encode(Cbor.decode(wire)).toSeq == wire.toSeq)
  }

  test("Cbor.decodePrefix: items off a stream, incomplete input waits, garbage fails") {
    val a = Cbor.encode(cArr(cInt(1)))
    val b = Cbor.encode(cText("yo"))
    val buf = a ++ b
    val Some((i1, off1)) = Cbor.decodePrefix(buf, 0)
    assert(Cbor.encode(i1).toSeq == a.toSeq && off1 == a.length)
    val Some((i2, off2)) = Cbor.decodePrefix(buf, off1)
    assert(Cbor.encode(i2).toSeq == b.toSeq && off2 == buf.length)
    assert(Cbor.decodePrefix(buf, buf.length).isEmpty)
    // every strict prefix of a message is "incomplete", never an error
    (1 until a.length).foreach(n => assert(Cbor.decodePrefix(a.take(n), 0).isEmpty))
    // malformed input still fails loudly (reserved additional info)
    intercept[RuntimeException](Cbor.decodePrefix(Array(0x1c.toByte), 0))
  }

  // ---- mux ----

  test("Mux: SDU header round-trip, multi-SDU split, partial-buffer decode") {
    val payload = Array.tabulate(40000)(i => (i * 31).toByte)
    val sdus = Mux.frames(5, payload, timestampMicros = 123456789L)
    assert(sdus.length == math.ceil(40000.0 / Mux.MaxPayload).toInt)
    assert(sdus.map(_.payload.length).sum == payload.length)
    val wire = sdus.map(Mux.encode).reduce(_ ++ _) ++
      Mux.encode(Mux.Sdu(7L, 0x123, responder = true, Array[Byte](9, 9)))
    // decode the whole stream
    val (out, rest) = Mux.decode(wire)
    assert(rest.isEmpty && out.length == sdus.length + 1)
    assert(out.take(sdus.length).flatMap(_.payload).toSeq == payload.toSeq)
    assert(out.last.protocolId == 0x123 && out.last.responder &&
      out.last.timestampMicros == 7L)
    assert(!out.head.responder && out.head.protocolId == 5 &&
      out.head.timestampMicros == 123456789L)
    // partial buffers: a split header and a split payload both wait
    val (none1, r1) = Mux.decode(wire.take(5))
    assert(none1.isEmpty && r1.length == 5)
    val (none2, r2) = Mux.decode(wire.take(20))
    assert(none2.isEmpty && r2.length == 20)
    // oversized payloads are rejected at encode
    intercept[Exception](Mux.encode(Mux.Sdu(0, 5, responder = false, new Array[Byte](70000))))
    intercept[Exception](Mux.encode(Mux.Sdu(0, 0x9999, responder = false, Array.emptyByteArray)))
  }

  // ---- handshake ----

  test("Handshake: propose shape, accept in both versionData forms, refuse") {
    val prop = Cbor.decode(Handshake.propose(magic = 764824073L))
    prop match {
      case CArr(Vector(CInt(tag, _, _), CMap(entries, _, _)), _, _) =>
        assert(tag == 0 && entries.length == 2)
        val versions = entries.map { case (CInt(v, _, _), data) =>
          data match {
            case CArr(Vector(CInt(m, _, _), CSimple(20, _, _)), _, _) =>
              assert(m == 764824073L); v.toLong
            case other => fail(s"bad versionData: $other")
          }
        }
        assert(versions == Vector(0x8010L, 0x8011L)) // n2c v16, v17 (bit 15 set)
      case other => fail(s"bad propose: $other")
    }
    // accept with the modern [magic, query] data
    val acc = Cbor.encode(cArr(cInt(1), cInt(0x8011L), cArr(cInt(42), cBool(false))))
    assert(Handshake.parseReply(acc) == Handshake.Accepted(0x8011L, 42L))
    // accept with the legacy bare-magic data
    val accOld = Cbor.encode(cArr(cInt(1), cInt(0x800eL), cInt(2L)))
    assert(Handshake.parseReply(accOld) == Handshake.Accepted(0x800eL, 2L))
    val ref = Cbor.encode(cArr(cInt(2), cArr(cInt(0), cText("no common version"))))
    assert(Handshake.parseReply(ref).isInstanceOf[Handshake.Refused])
    intercept[RuntimeException](Handshake.parseReply(Cbor.encode(cArr(cInt(9)))))
    intercept[Exception](Handshake.propose(1L, versions = Seq(14)))
  }

  // ---- chain-sync session ----

  /** A minimal era-wrapped Conway block the existing data plane decodes:
    * the roll-forward payload IS what BlockCbor.blockToOgmios consumes. */
  private def fixtureBlock(slot: Long): (Array[Byte], String) = {
    val headerBody = cArr(cInt(5), cInt(slot), cBytes(Array.fill[Byte](32)(0)))
    val header = cArr(headerBody, cBytes(Array.fill[Byte](8)(0x77.toByte)))
    val block = cArr(header, cArr(), cArr(), cMap(), cArr())
    val wrapped = Cbor.encode(cArr(cInt(6), block))
    (wrapped, Hex.encode(Blake2b.hash256(Cbor.encode(header))))
  }

  private def serverSend(msgs: Array[Byte]*): Array[Byte] =
    msgs.flatMap(m => m.grouped(Mux.MaxPayload).map(p =>
      Mux.encode(Mux.Sdu(0L, CS.ProtocolId, responder = true, p)))).toArray.flatten

  test("chain-sync session: negotiate, roll forward into the data plane, await, roll back") {
    val candidate = Point(77L, "aa" * 32)
    val client = new ChainSyncWire.Client(Seq(candidate))
    // the opening bytes are one FindIntersect listing the candidates
    val (opening, rest0) = Mux.decode(client.start())
    assert(rest0.isEmpty && opening.length == 1 && opening.head.protocolId == CS.ProtocolId)
    CS.decode(Cbor.decode(opening.head.payload)) match {
      case CS.FindIntersect(ps) => assert(ps == Seq(candidate))
      case other => fail(s"expected FindIntersect, got $other")
    }
    val tip = cArr(cArr(cInt(200), cBytes(Array.fill[Byte](32)(2))), cInt(9))
    // ---- IntersectFound, fed ONE BYTE AT A TIME (transport chunking) ----
    val found = Cbor.encode(cArr(cInt(5),
      cArr(cInt(77), cBytes(Hex.decode("aa" * 32).get)), tip))
    val foundWire = serverSend(found)
    var events = Seq.empty[ChainSyncWire.Event]
    var sent = Array.emptyByteArray
    foundWire.foreach { b =>
      val (evs, out) = client.onBytes(Array(b)); events ++= evs; sent ++= out
    }
    assert(events == Seq(ChainSyncWire.Negotiated(Some(candidate), CS.Tip(
      Some(Point(200L, "02" * 32)), 9L))))
    val (reqSdus, _) = Mux.decode(sent)
    assert(reqSdus.length == 1 && CS.decode(Cbor.decode(reqSdus.head.payload)) == CS.RequestNext)
    // ---- RollForward whose payload spans TWO SDUs, plus AwaitReply in the
    // same flight: the reassembly buffer and the message loop both work ----
    val (blockBytes, headerHash) = fixtureBlock(slot = 501L)
    val roll = Cbor.encode(cArr(cInt(2), cTag(24, cBytes(blockBytes)), tip))
    val rollSdu1 = Mux.encode(Mux.Sdu(0L, CS.ProtocolId, responder = true, roll.take(10)))
    val rollSdu2 = Mux.encode(Mux.Sdu(0L, CS.ProtocolId, responder = true, roll.drop(10)))
    val await = serverSend(Cbor.encode(cArr(cInt(1))))
    val (evs2a, out2a) = client.onBytes(rollSdu1)
    assert(evs2a.isEmpty && out2a.isEmpty) // half a message: nothing yet
    val (evs2, out2) = client.onBytes(rollSdu2 ++ await)
    val fwd = evs2.collect { case f: ChainSyncWire.Forwarded => f }
    assert(fwd.length == 1 && evs2.length == 1)
    assert(fwd.head.tip.blockNo == 9L)
    // the forwarded payload drives the EXISTING data plane end to end
    val line = graft.ingest.BlockCbor.blockToOgmios(Hex.encode(fwd.head.blockCbor))
    assert(line.contains(""""slot":501""") && line.contains(s""""id":"$headerHash""""))
    val (req2, _) = Mux.decode(out2)
    assert(req2.length == 1 && CS.decode(Cbor.decode(req2.head.payload)) == CS.RequestNext)
    // ---- RollBackward from the awaited state ----
    val back = serverSend(Cbor.encode(cArr(cInt(3), cArr(), tip)))
    val (evs3, out3) = client.onBytes(back)
    assert(evs3 == Seq(ChainSyncWire.RolledBack(None, CS.Tip(Some(Point(200L, "02" * 32)), 9L))))
    assert(Mux.decode(out3)._1.length == 1)
    // ---- protocol violations fail loudly ----
    intercept[RuntimeException](client.onBytes(serverSend(found)))
    val foreign = Mux.encode(Mux.Sdu(0L, 9, responder = true, Array[Byte](0x40)))
    intercept[Exception] {
      val c2 = new ChainSyncWire.Client(Seq(candidate)); c2.start(); c2.onBytes(foreign)
    }
  }

  test("elastic pipelining: 100 in flight far from tip, drains to 1 near it, never stalls") {
    def countRequests(bytes: Array[Byte]): Int = {
      val (sdus, rest) = Mux.decode(bytes)
      assert(rest.isEmpty)
      sdus.map(s => CS.decode(Cbor.decode(s.payload))).count(_ == CS.RequestNext)
    }
    val farTip = cArr(cArr(cInt(50000), cBytes(Array.fill[Byte](32)(5))), cInt(2000))
    val client = new ChainSyncWire.Client(Seq(Point(10L, "cc" * 32)))
    client.start()
    val found = serverSend(Cbor.encode(cArr(cInt(5),
      cArr(cInt(10), cBytes(Hex.decode("cc" * 32).get)), farTip)))
    val (_, out1) = client.onBytes(found)
    // 49990 slots behind → the reference's >6000 tier: 100 in flight
    assert(countRequests(out1) == 100, s"want 100 pipelined, got ${countRequests(out1)}")
    // a forwarded block still far from tip: one reply collected, one top-up
    val (blk, _) = fixtureBlock(slot = 20L)
    val roll = serverSend(Cbor.encode(cArr(cInt(2), cTag(24, cBytes(blk)), farTip)))
    val (evs2, out2) = client.onBytes(roll)
    assert(evs2.length == 1 && countRequests(out2) == 1)
    // the server rolls us back to NEAR the tip: budget collapses to 1, and
    // with 99 replies still owed nothing new is requested
    val back = serverSend(Cbor.encode(cArr(cInt(3),
      cArr(cInt(49500), cBytes(Array.fill[Byte](32)(6))), farTip)))
    val (evs3, out3) = client.onBytes(back)
    assert(evs3.length == 1 && countRequests(out3) == 0)
    // draining the backlog: each owed reply arrives, no new requests —
    // until the last one, where the ≥1 floor keeps the conversation alive
    val nearRoll = Cbor.encode(cArr(cInt(2),
      cTag(24, cBytes(fixtureBlock(slot = 49600L)._1)), farTip))
    (1 to 98).foreach { _ =>
      val (e, o) = client.onBytes(serverSend(nearRoll))
      assert(e.length == 1 && countRequests(o) == 0)
    }
    val (eLast, oLast) = client.onBytes(serverSend(nearRoll))
    assert(eLast.length == 1 && countRequests(oLast) == 1,
      "the floor must keep one request outstanding")
    // AwaitReply with requests outstanding parks the machine; a reply resumes
    val (eAwait, oAwait) = client.onBytes(serverSend(Cbor.encode(cArr(cInt(1)))))
    assert(eAwait.isEmpty && oAwait.isEmpty)
    val (eResume, _) = client.onBytes(serverSend(nearRoll))
    assert(eResume.length == 1)
  }

  test("forced rollback: drains in-flight replies silently, re-negotiates, resumes") {
    def requests(bytes: Array[Byte]): Seq[CS.Msg] = {
      val (sdus, rest) = Mux.decode(bytes); assert(rest.isEmpty)
      sdus.map(s => CS.decode(Cbor.decode(s.payload)))
    }
    val farTip = cArr(cArr(cInt(50000), cBytes(Array.fill[Byte](32)(5))), cInt(2000))
    val client = new ChainSyncWire.Client(Seq(Point(10L, "cc" * 32)))
    client.start()
    val (_, out1) = client.onBytes(serverSend(Cbor.encode(cArr(cInt(5),
      cArr(cInt(10), cBytes(Hex.decode("cc" * 32).get)), farTip))))
    assert(requests(out1).count(_ == CS.RequestNext) == 100)
    // a pattern install wants the chain re-read from slot 3 — with 100
    // replies owed, nothing can be sent yet
    val target = Point(3L, "dd" * 32)
    assert(client.forceRollback(target).isEmpty)
    // 99 owed replies drain with NO events and NO new requests...
    val roll = Cbor.encode(cArr(cInt(2),
      cTag(24, cBytes(fixtureBlock(slot = 20L)._1)), farTip))
    (1 to 99).foreach { _ =>
      val (e, o) = client.onBytes(serverSend(roll))
      assert(e.isEmpty && o.isEmpty)
    }
    // ...and the 100th collect emits the forced FindIntersect
    val (eDrained, oDrained) = client.onBytes(serverSend(roll))
    assert(eDrained.isEmpty)
    requests(oDrained) match {
      case Seq(CS.FindIntersect(ps)) => assert(ps == Seq(target))
      case other => fail(s"expected the forced FindIntersect, got $other")
    }
    // the found intersection resumes streaming (Negotiated + pipeline refill)
    val (eRes, oRes) = client.onBytes(serverSend(Cbor.encode(cArr(cInt(5),
      cArr(cInt(3), cBytes(Hex.decode("dd" * 32).get)), farTip))))
    assert(eRes == Seq(ChainSyncWire.Negotiated(Some(target),
      CS.Tip(Some(Point(50000L, "05" * 32)), 2000L))))
    assert(requests(oRes).count(_ == CS.RequestNext) == 100)
    // a forced point missing from the chain is a caller bug, loudly —
    // NOT the cold-boot NoIntersection flow
    val c2 = new ChainSyncWire.Client(Seq(Point(10L, "cc" * 32)))
    c2.start()
    val (_, _) = c2.onBytes(serverSend(Cbor.encode(cArr(cInt(5),
      cArr(cInt(10), cBytes(Hex.decode("cc" * 32).get)),
      cArr(cArr(cInt(10), cBytes(Array.fill[Byte](32)(5))), cInt(1))))))
    val sent = c2.forceRollback(Point(4L, "ee" * 32))
    // near tip only 1 was in flight; drain it, then the intersect goes out
    assert(sent.isEmpty)
    val (_, o2) = c2.onBytes(serverSend(roll))
    assert(requests(o2).exists(_.isInstanceOf[CS.FindIntersect]))
    val notFound = serverSend(Cbor.encode(cArr(cInt(6),
      cArr(cArr(cInt(5), cBytes(Array.fill[Byte](32)(3))), cInt(1)))))
    val ex = intercept[RuntimeException](c2.onBytes(notFound))
    assert(ex.getMessage.contains("forced rollback point"), ex.getMessage)
  }

  /** A fake node on a REAL socket: accept one connection, answer the
    * handshake, negotiate, serve the chain (splitting one reply to
    * exercise stream reassembly), AwaitReply at tip, then close. */
  private def serveOnce(server: java.nio.channels.ServerSocketChannel,
                        chain: Seq[(graft.streaming.Resume.Point, Array[Byte])]): Thread = {
    val t = new Thread(() => {
      val ch = server.accept()
      try {
        val bb = java.nio.ByteBuffer.allocate(64 * 1024)
        var raw = Array.emptyByteArray
        var hsDone = false
        var msgBytes = Array.emptyByteArray
        var cursor = 0
        var closing = false
        val tipItem = cArr(
          cArr(cInt(chain.last._1.slot), cBytes(Hex.decode(chain.last._1.headerHash).get)),
          cInt(chain.length.toLong))
        def send(proto: Int, payload: Array[Byte], split: Boolean = false): Unit = {
          val frames =
            if (split && payload.length > 4)
              Seq(payload.take(4), payload.drop(4)).map(p =>
                Mux.encode(Mux.Sdu(0L, proto, responder = true, p)))
            else Seq(Mux.encode(Mux.Sdu(0L, proto, responder = true, payload)))
          frames.foreach { f =>
            val out = java.nio.ByteBuffer.wrap(f)
            while (out.hasRemaining) ch.write(out)
          }
        }
        while (!closing) {
          bb.clear()
          val n = ch.read(bb)
          if (n < 0) closing = true
          else {
            val chunk = new Array[Byte](n); bb.flip(); bb.get(chunk)
            raw = raw ++ chunk
            val (sdus, rest) = Mux.decode(raw)
            raw = rest
            sdus.foreach(s => msgBytes = msgBytes ++ s.payload)
            var off = 0
            var more = true
            while (more) Cbor.decodePrefix(msgBytes, off) match {
              case Some((item, next)) =>
                off = next
                if (!hsDone) {
                  // the propose: accept its first listed version
                  val (v, magic) = item match {
                    case CArr(Vector(CInt(z, _, _), CMap(es, _, _)), _, _) if z == 0 =>
                      es.head match {
                        case (CInt(vn, _, _), CArr(CInt(m, _, _) +: _, _, _)) =>
                          (vn.toLong, m.toLong)
                        case other => sys.error(s"bad propose entry: $other")
                      }
                    case other => sys.error(s"bad propose: $other")
                  }
                  send(Handshake.ProtocolId, Cbor.encode(
                    cArr(cInt(1), cInt(v), cArr(cInt(magic), cBool(false)))))
                  hsDone = true
                } else CS.decode(item) match {
                  case CS.FindIntersect(points) =>
                    val found = points.find(p => chain.exists(_._1 == p))
                      .getOrElse(sys.error("fake node: no intersection"))
                    cursor = chain.indexWhere(_._1 == found) + 1
                    send(CS.ProtocolId, Cbor.encode(cArr(cInt(5),
                      cArr(cInt(found.slot), cBytes(Hex.decode(found.headerHash).get)),
                      tipItem)))
                  case CS.RequestNext =>
                    if (cursor < chain.length) {
                      send(CS.ProtocolId, Cbor.encode(cArr(cInt(2),
                        cTag(24, cBytes(chain(cursor)._2)), tipItem)), split = true)
                      cursor += 1
                    } else {
                      send(CS.ProtocolId, Cbor.encode(cArr(cInt(1)))) // AwaitReply
                      closing = true // tip reached: hang up, client sees EOF
                    }
                  case other => sys.error(s"fake node got $other")
                }
              case None => more = false
            }
            msgBytes = java.util.Arrays.copyOfRange(msgBytes, off, msgBytes.length)
          }
        }
      } finally ch.close()
    })
    t.setDaemon(true)
    t.start()
    t
  }

  private def socketChain(): Seq[(graft.streaming.Resume.Point, Array[Byte])] =
    Seq(31L -> 1, 47L -> 2).map { case (slot, seed) =>
      val headerBody = cArr(cInt(5), cInt(slot), cBytes(Array.fill[Byte](32)(seed.toByte)))
      val header = cArr(headerBody, cBytes(Array.fill[Byte](8)(0x11.toByte)))
      (graft.streaming.Resume.Point(slot, Hex.encode(Blake2b.hash256(Cbor.encode(header)))),
        Cbor.encode(cArr(cInt(6), cArr(header, cArr(), cArr(), cMap(), cArr()))))
    }

  test("NodeClient over loopback TCP: handshake, negotiate, stream to EOF") {
    val server = java.nio.channels.ServerSocketChannel.open()
    server.bind(new java.net.InetSocketAddress("127.0.0.1", 0))
    val chain = socketChain()
    val t = serveOnce(server, chain)
    try {
      val log = graft.streaming.NodeClient.run(
        server.getLocalAddress, magic = 42L, candidates = Seq(chain.head._1))
      assert(log.accepted == Handshake.Accepted(0x8010L, 42L))
      assert(log.events.collect {
        case ChainSyncWire.Negotiated(p, _) => p }.flatten == Vector(chain.head._1))
      val fwd = log.events.collect { case ChainSyncWire.Forwarded(b, _) => b }
      assert(fwd.length == 1) // only the block AFTER the intersection
      val line = graft.ingest.BlockCbor.blockToOgmios(Hex.encode(fwd.head))
      assert(line.contains(""""slot":47"""))
    } finally { t.join(10000); server.close() }
  }

  test("NodeClient over a UNIX domain socket (the bearer a cardano-node listens on)") {
    val path = java.nio.file.Files.createTempDirectory("graft-uds").resolve("node.socket")
    val server = java.nio.channels.ServerSocketChannel.open(
      java.net.StandardProtocolFamily.UNIX)
    server.bind(java.net.UnixDomainSocketAddress.of(path))
    val chain = socketChain()
    val t = serveOnce(server, chain)
    try {
      val log = graft.streaming.NodeClient.run(
        java.net.UnixDomainSocketAddress.of(path), magic = 2L,
        candidates = Seq(chain.head._1))
      assert(log.accepted.magic == 2L)
      assert(log.events.collect { case ChainSyncWire.Forwarded(b, _) => b }.length == 1)
    } finally { t.join(10000); server.close(); java.nio.file.Files.deleteIfExists(path) }
  }

  test("chain-sync session: intersect-not-found terminates with Done") {
    val client = new ChainSyncWire.Client(Seq(Point(1L, "bb" * 32)))
    client.start()
    val notFound = serverSend(Cbor.encode(cArr(cInt(6),
      cArr(cArr(cInt(5), cBytes(Array.fill[Byte](32)(3))), cInt(1)))))
    val (evs, out) = client.onBytes(notFound)
    assert(evs == Seq(ChainSyncWire.NoIntersection(
      CS.Tip(Some(Point(5L, "03" * 32)), 1L))))
    val (sdus, _) = Mux.decode(out)
    assert(CS.decode(Cbor.decode(sdus.head.payload)) == CS.Done)
    // the machine is finished: any further message is a violation
    intercept[RuntimeException](client.onBytes(notFound))
    // calling start twice is a bug, loudly
    intercept[Exception](client.start())
  }
}
