package graft.streaming

import graft.codec.Cbor
import graft.codec.Cbor._
import graft.codec.Hex
import graft.streaming.Resume.Point

/** The Ouroboros node-to-client WIRE protocol, implemented pure: mux SDU
  * framing, the handshake mini-protocol, the chain-sync mini-protocol
  * codec, and a byte-in/byte-out client state machine. Everything here is
  * transport-agnostic — feed received bytes in arbitrary chunks, send the
  * returned bytes — so the one piece left outside the library is a literal
  * socket pump (`java.nio.channels.SocketChannel` read/write loop; kupo
  * gets the same layering from the ouroboros-network stack, see
  * /root/reference/src/Kupo/App/ChainSync/Node.hs:1-120 for the client it
  * wires and /root/reference/src/Kupo/App.hs:380-404 for the connection
  * composition).
  *
  * Formats follow the published network specification (the CDDL in
  * `ouroboros-network`'s design documents):
  *   - mux SDU: 4-byte transmission timestamp, 1 mode bit + 15-bit
  *     mini-protocol number, 2-byte payload length, all big-endian.
  *   - handshake (protocol 0): `[0, {versionNumber => versionData}]`
  *     propose, `[1, versionNumber, versionData]` accept, `[2, reason]`
  *     refuse, `[3, versionTable]` query reply; node-to-client version
  *     numbers carry bit 15 set, and versionData is `[networkMagic,
  *     query]` from v15 on (bare magic before).
  *   - chain-sync (node-to-client protocol 5): `[0]` request-next, `[1]`
  *     await-reply, `[2, wrappedBlock, tip]` roll-forward, `[3, point,
  *     tip]` roll-backward, `[4, points]` find-intersect, `[5, point,
  *     tip]` intersect-found, `[6, tip]` intersect-not-found, `[7]` done;
  *     `point` = `[]` (origin) or `[slot, hash]`; `tip` = `[point,
  *     blockNo]`; the n2c roll-forward block is tag-24-wrapped CBOR whose
  *     payload is the era-wrapped block [[graft.ingest.BlockCbor]]
  *     already decodes — the data plane connects HERE. */
object ChainSyncWire {

  // ---- mux framing ----

  object Mux {
    /** One service data unit. `responder` is the sender's view: replies
      * from the node arrive with the bit set. */
    final case class Sdu(timestampMicros: Long, protocolId: Int,
                         responder: Boolean, payload: Array[Byte])

    /** Default segment budget (the spec's default maximum SDU payload). */
    val MaxPayload = 12288

    def encode(sdu: Sdu): Array[Byte] = {
      require(sdu.payload.length <= 0xffff, s"SDU payload ${sdu.payload.length} > 65535")
      require(sdu.protocolId >= 0 && sdu.protocolId <= 0x7fff,
        s"mini-protocol id out of range: ${sdu.protocolId}")
      val bb = java.nio.ByteBuffer.allocate(8 + sdu.payload.length)
      bb.putInt((sdu.timestampMicros & 0xffffffffL).toInt)
      bb.putShort(((if (sdu.responder) 0x8000 else 0) | sdu.protocolId).toShort)
      bb.putShort(sdu.payload.length.toShort)
      bb.put(sdu.payload)
      bb.array()
    }

    /** Split a message into ≤[[MaxPayload]] SDUs for one mini-protocol. */
    def frames(protocolId: Int, message: Array[Byte],
               timestampMicros: Long = 0L): Seq[Sdu] =
      if (message.isEmpty) Seq(Sdu(timestampMicros, protocolId, responder = false, message))
      else message.grouped(MaxPayload).map(
        Sdu(timestampMicros, protocolId, responder = false, _)).toSeq

    /** Parse complete SDUs off the front of `buf`; returns them plus the
      * unconsumed remainder (a partial header or partial payload). */
    def decode(buf: Array[Byte]): (Seq[Sdu], Array[Byte]) = {
      val out = Seq.newBuilder[Sdu]
      var off = 0
      var done = false
      while (!done) {
        if (buf.length - off < 8) done = true
        else {
          val bb = java.nio.ByteBuffer.wrap(buf, off, 8)
          val ts = bb.getInt.toLong & 0xffffffffL
          val modeProto = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          if (buf.length - off < 8 + len) done = true
          else {
            out += Sdu(ts, modeProto & 0x7fff, (modeProto & 0x8000) != 0,
              java.util.Arrays.copyOfRange(buf, off + 8, off + 8 + len))
            off += 8 + len
          }
        }
      }
      (out.result(), java.util.Arrays.copyOfRange(buf, off, buf.length))
    }
  }

  // ---- handshake mini-protocol (number 0) ----

  object Handshake {
    val ProtocolId = 0

    /** Node-to-client version numbers carry bit 15. */
    def n2cVersion(n: Int): Long = 0x8000L | n.toLong

    sealed trait Result
    final case class Accepted(versionNumber: Long, magic: Long) extends Result
    final case class Refused(reason: String) extends Result

    /** `[0, {versionNumber => [magic, false]}]` proposing the given n2c
      * versions (all ≥ 15, where versionData grew the query flag). */
    def propose(magic: Long, versions: Seq[Int] = Seq(16, 17)): Array[Byte] = {
      require(versions.nonEmpty && versions.forall(_ >= 15),
        s"n2c proposals below v15 need bare-magic versionData: $versions")
      Cbor.encode(cArr(cInt(0), cMap(versions.sorted.map(v =>
        (cInt(n2cVersion(v)): Item, cArr(cInt(magic), cBool(false)): Item)): _*)))
    }

    def parseReply(bytes: Array[Byte]): Result = parseReplyItem(Cbor.decode(bytes))

    def parseReplyItem(item: Item): Result = item match {
      case CArr(Vector(CInt(tag, _, _), CInt(v, _, _), data), _, _) if tag == 1 =>
        val magic = data match {
          case CArr(CInt(m, _, _) +: _, _, _) => m.toLong
          case CInt(m, _, _)                  => m.toLong
          case other => sys.error(s"unrecognized versionData: $other")
        }
        Accepted(v.toLong, magic)
      case CArr(CInt(tag, _, _) +: reason, _, _) if tag == 2 =>
        Refused(reason.mkString(", "))
      case other => sys.error(s"unexpected handshake reply: $other")
    }
  }

  // ---- chain-sync mini-protocol (node-to-client number 5) ----

  object ChainSyncCodec {
    val ProtocolId = 5

    sealed trait Msg
    case object RequestNext extends Msg
    case object AwaitReply extends Msg
    /** `blockCbor` is the tag-24 payload: the era-wrapped block bytes
      * [[graft.ingest.BlockCbor.blockToOgmios]] consumes directly. */
    final case class RollForward(blockCbor: Array[Byte], tip: Tip) extends Msg
    final case class RollBackward(point: Option[Point], tip: Tip) extends Msg
    final case class FindIntersect(points: Seq[Point]) extends Msg
    final case class IntersectFound(point: Option[Point], tip: Tip) extends Msg
    final case class IntersectNotFound(tip: Tip) extends Msg
    case object Done extends Msg

    /** Chain tip: its point (None = origin) and block height. */
    final case class Tip(point: Option[Point], blockNo: Long)

    private def pointItem(p: Option[Point]): Item = p match {
      case None => cArr()
      case Some(Point(slot, hash)) =>
        cArr(cInt(slot), cBytes(Hex.decode(hash).getOrElse(
          sys.error(s"point hash is not hex: $hash"))))
    }

    private def parsePoint(i: Item): Option[Point] = i match {
      case CArr(Vector(), _, _) => None
      case CArr(Vector(CInt(slot, _, _), CBytes(h, _, _)), _, _) =>
        Some(Point(slot.toLong, Hex.encode(h)))
      case other => sys.error(s"malformed point: $other")
    }

    private def parseTip(i: Item): Tip = i match {
      case CArr(Vector(p, CInt(no, _, _)), _, _) => Tip(parsePoint(p), no.toLong)
      case other => sys.error(s"malformed tip: $other")
    }

    def encode(msg: Msg): Array[Byte] = msg match {
      case RequestNext => Cbor.encode(cArr(cInt(0)))
      case FindIntersect(points) =>
        Cbor.encode(cArr(cInt(4), cArr(points.map(p => pointItem(Some(p))): _*)))
      case Done => Cbor.encode(cArr(cInt(7)))
      case other => sys.error(s"client never sends $other")
    }

    def decode(item: Item): Msg = item match {
      case CArr(CInt(tag, _, _) +: rest, _, _) => (tag.toInt, rest) match {
        case (0, Vector()) => RequestNext
        case (1, Vector()) => AwaitReply
        case (2, Vector(CTag(24, CBytes(b, _, _), _, _), tip)) =>
          RollForward(b, parseTip(tip))
        case (3, Vector(p, tip)) => RollBackward(parsePoint(p), parseTip(tip))
        case (4, Vector(CArr(pts, _, _))) =>
          FindIntersect(pts.map(p => parsePoint(p).getOrElse(
            sys.error("origin in FindIntersect is unrepresentable here — " +
              "negotiate from origin by sending no candidates"))))
        case (5, Vector(p, tip)) => IntersectFound(parsePoint(p), parseTip(tip))
        case (6, Vector(tip)) => IntersectNotFound(parseTip(tip))
        case (7, Vector()) => Done
        case _ => sys.error(s"malformed chain-sync message: $item")
      }
      case other => sys.error(s"malformed chain-sync message: $other")
    }
  }

  // ---- the client state machine ----

  /** Byte-in/byte-out chain-sync client: negotiate the intersection from
    * `candidates`, then stream with ELASTIC PIPELINING and surface every
    * server transition as an [[Event]]. Drive it from any transport: send
    * [[start]]'s bytes, then for every received chunk call [[onBytes]] and
    * send what it returns. Protocol violations (a message in the wrong
    * state, an unknown tag, a foreign mini-protocol id) fail loudly — a
    * sync client must never silently resynchronize.
    *
    * Pipelining mirrors the reference's distance-from-tip policy
    * (/root/reference/src/Kupo/Data/ChainSync.hs:70-74 — >6000 slots
    * behind: 100 in flight; >1000: 5; near tip: 1): far from the tip the
    * wire stays full so sync throughput is wire-bound, near the tip at
    * most one request is outstanding so a forced rollback never waits
    * behind a pile of ~20 s-apart replies. The cursor slot advances from
    * each forwarded block's header (era-wrapped Shelley+ blocks; a
    * non-parsing era conservatively keeps the previous distance).
    *
    * The handshake runs first ([[Handshake.propose]] / [[handshakeReply]])
    * because the spec multiplexes it on the same bearer before any other
    * mini-protocol; this class handles chain-sync proper. */
  sealed trait Event
  final case class Forwarded(blockCbor: Array[Byte], tip: ChainSyncCodec.Tip) extends Event
  final case class RolledBack(point: Option[Point], tip: ChainSyncCodec.Tip) extends Event
  final case class Negotiated(point: Option[Point], tip: ChainSyncCodec.Tip) extends Event
  final case class NoIntersection(tip: ChainSyncCodec.Tip) extends Event

  final class Client(candidates: Seq[Point]) {
    import ChainSyncCodec._

    private sealed trait State
    private case object AwaitingIntersect extends State
    private case object CanAwait extends State
    private case object MustReply extends State
    private case object Finished extends State

    private var state: State = AwaitingIntersect
    /** Transport bytes not yet forming a complete SDU. */
    private var pending: Array[Byte] = Array.emptyByteArray
    /** Reassembled mini-protocol bytes not yet forming a complete CBOR
      * message (a roll-forward block spans many SDUs). */
    private var msgBuf: Array[Byte] = Array.emptyByteArray
    private var started = false
    /** Outstanding RequestNexts the server still owes a reply for. */
    private var inFlight = 0
    private var cursorSlot = 0L
    private var tipSlot = 0L

    /** The reference's elastic policy: slots behind the tip → in-flight
      * budget. */
    private def maxInFlight: Int = {
      val d = math.max(0L, tipSlot - cursorSlot)
      if (d > 6000) 100 else if (d > 1000) 5 else 1
    }

    /** Fill the pipeline to budget (always ≥ 1 outstanding so the
      * conversation can never stall). */
    private def topUp(): Seq[Array[Byte]] = {
      val n = math.max(if (inFlight == 0) 1 else 0, maxInFlight - inFlight)
      inFlight += n
      Seq.fill(n)(ChainSyncCodec.encode(RequestNext))
    }

    private def noteTip(tip: Tip): Unit =
      tipSlot = tip.point.map(_.slot).getOrElse(0L)

    /** Best-effort slot of an era-wrapped block (header body's second
      * field for Shelley+); a non-parsing era keeps the previous cursor
      * — the budget just stays at its last value. */
    private def blockSlot(blockCbor: Array[Byte]): Option[Long] =
      try Cbor.decode(blockCbor) match {
        case CArr(Vector(CInt(era, _, _), CArr(
          CArr(Vector(CArr(CInt(_, _, _) +: CInt(slot, _, _) +: _, _, _), _), _, _) +: _,
          _, _)), _, _) if era >= 2 => Some(slot.toLong)
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }

    /** A pattern-install (U6) wants the chain re-read from `point`:
      * outstanding replies are collected AND DROPPED, then the client
      * re-negotiates — the reference's forced-rollback flow
      * (/root/reference/src/Kupo/App/ChainSync/Node.hs:118-150,
      * `clientStCollect`). */
    private var forced: Option[Point] = None

    /** The mux-framed FindIntersect that opens the conversation. */
    def start(): Array[Byte] = {
      require(!started, "client already started")
      started = true
      Mux.frames(ChainSyncCodec.ProtocolId,
        ChainSyncCodec.encode(FindIntersect(candidates)))
        .map(Mux.encode).reduce(_ ++ _)
    }

    /** Request a forced rollback to `point`. Every reply still in flight
      * is dropped as it arrives; once the pipeline drains, the returned
      * bytes (or the bytes of a later [[onBytes]]) carry the new
      * FindIntersect. The caller must have checked the point exists — an
      * IntersectNotFound after a forced rollback fails loudly, like the
      * reference's ForcedIntersectionNotFound. */
    def forceRollback(point: Point): Array[Byte] = {
      require(started, "call start() first")
      require(state == CanAwait || state == MustReply,
        s"forced rollback during $state")
      forced = Some(point)
      if (inFlight == 0)
        Mux.frames(ChainSyncCodec.ProtocolId, forcedIntersectMsg())
          .map(Mux.encode).reduce(_ ++ _)
      else Array.emptyByteArray
    }

    /** Whether the in-progress negotiation came from [[forceRollback]] —
      * its IntersectNotFound is a caller bug, not a cold boot. */
    private var negotiationForced = false

    private def forcedIntersectMsg(): Array[Byte] = {
      val p = forced.get
      forced = None
      state = AwaitingIntersect
      negotiationForced = true
      ChainSyncCodec.encode(FindIntersect(Seq(p)))
    }

    /** Feed received transport bytes (any chunking); returns the events
      * they complete and the bytes to send back. */
    def onBytes(chunk: Array[Byte]): (Seq[Event], Array[Byte]) = {
      require(started, "call start() first")
      pending = pending ++ chunk
      val (sdus, rest) = Mux.decode(pending)
      pending = rest
      sdus.foreach { sdu =>
        require(sdu.protocolId == ChainSyncCodec.ProtocolId,
          s"unexpected mini-protocol ${sdu.protocolId} on the chain-sync client")
        msgBuf = msgBuf ++ sdu.payload
      }
      val events = Seq.newBuilder[Event]
      val toSend = Seq.newBuilder[Array[Byte]]
      var off = 0
      var more = true
      while (more) Cbor.decodePrefix(msgBuf, off) match {
        case Some((item, next)) =>
          off = next
          val (evs, out) = onMessage(ChainSyncCodec.decode(item))
          events ++= evs
          toSend ++= out
        case None => more = false
      }
      // a message split across SDUs keeps its prefix until the rest arrives
      msgBuf = java.util.Arrays.copyOfRange(msgBuf, off, msgBuf.length)
      (events.result(),
        toSend.result().flatMap(m => Mux.frames(ChainSyncCodec.ProtocolId, m)
          .map(Mux.encode)).foldLeft(Array.emptyByteArray)(_ ++ _))
    }

    private def onMessage(msg: Msg): (Seq[Event], Seq[Array[Byte]]) = {
      // forced-rollback drain: collect and DROP every reply still owed,
      // then re-negotiate from the forced point
      if (forced.isDefined && state != AwaitingIntersect) return msg match {
        case RollForward(_, _) | RollBackward(_, _) =>
          require(inFlight >= 1, s"$msg with no request outstanding")
          inFlight -= 1
          state = CanAwait
          if (inFlight == 0) (Nil, Seq(forcedIntersectMsg())) else (Nil, Nil)
        case AwaitReply =>
          require(inFlight >= 1, "AwaitReply with no request outstanding")
          state = MustReply
          (Nil, Nil)
        case m => sys.error(s"protocol violation: $m while draining for a forced rollback")
      }
      (state, msg) match {
      case (AwaitingIntersect, IntersectFound(p, tip)) =>
        state = CanAwait
        negotiationForced = false
        cursorSlot = p.map(_.slot).getOrElse(0L)
        noteTip(tip)
        (Seq(Negotiated(p, tip)), topUp())
      case (AwaitingIntersect, IntersectNotFound(tip)) =>
        if (negotiationForced)
          sys.error(s"forced rollback point is not on the chain (tip $tip)")
        state = Finished
        (Seq(NoIntersection(tip)), Seq(ChainSyncCodec.encode(Done)))
      case (CanAwait, AwaitReply) =>
        require(inFlight >= 1, "AwaitReply with no request outstanding")
        state = MustReply
        (Nil, Nil) // tip reached: the reply to the outstanding request will block
      case (CanAwait | MustReply, RollForward(b, tip)) =>
        require(inFlight >= 1, "RollForward with no request outstanding")
        inFlight -= 1
        state = CanAwait
        blockSlot(b).foreach(cursorSlot = _)
        noteTip(tip)
        (Seq(Forwarded(b, tip)), topUp())
      case (CanAwait | MustReply, RollBackward(p, tip)) =>
        require(inFlight >= 1, "RollBackward with no request outstanding")
        inFlight -= 1
        state = CanAwait
        cursorSlot = p.map(_.slot).getOrElse(0L)
        noteTip(tip)
        (Seq(RolledBack(p, tip)), topUp())
      case (s, m) => sys.error(s"protocol violation: $m in state $s")
      }
    }
  }

  /** Parse a handshake-phase mux payload (the reply to
    * [[Handshake.propose]], which the caller frames with
    * `Mux.frames(Handshake.ProtocolId, …)`). */
  def handshakeReply(sduPayload: Array[Byte]): Handshake.Result =
    Handshake.parseReply(sduPayload)
}
