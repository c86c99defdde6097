package graft.streaming

import graft.streaming.ChainSyncWire.{Handshake, Mux}
import graft.streaming.Resume.Point

import java.nio.ByteBuffer
import java.nio.channels.SocketChannel

/** The socket pump — the LAST layer of S1: connect, handshake, then drive
  * [[ChainSyncWire.Client]] over a real byte stream. Works over TCP
  * (`InetSocketAddress`) and over the UNIX domain socket a cardano-node
  * actually listens on (`UnixDomainSocketAddress`, JDK 16+) — the same
  * bearer kupo's ouroboros-network stack opens
  * (/root/reference/src/Kupo/App.hs:380-404 `withChainSyncServer`).
  *
  * Deliberately minimal: one blocking channel, the protocol logic all
  * lives in the pure [[ChainSyncWire]] layer this merely pumps bytes
  * through. Returns when `stop()` answers true, on end-of-stream from the
  * peer, or by throwing on a protocol violation (never silently
  * resynchronizes — the caller's supervisor restarts the connection, like
  * the reference's producer-restart composition). */
object NodeClient {

  /** Version-negotiation outcome + the events streamed until shutdown. */
  final case class SessionLog(accepted: Handshake.Accepted,
                              events: Vector[ChainSyncWire.Event])

  def run(address: java.net.SocketAddress, magic: Long,
          candidates: Seq[Point],
          onEvent: ChainSyncWire.Event => Unit = _ => (),
          stop: () => Boolean = () => false,
          forceRollbackSignal: () => Option[Point] = () => None): SessionLog = {
    val ch = SocketChannel.open(address)
    try {
      // ---- handshake phase: one propose, one reply ----
      writeAll(ch, Mux.frames(Handshake.ProtocolId, Handshake.propose(magic))
        .map(Mux.encode).reduce(_ ++ _))
      val (reply, leftover) = readHandshakeReply(ch)
      val accepted = reply match {
        case a: Handshake.Accepted => a
        case Handshake.Refused(reason) =>
          sys.error(s"node refused every proposed version: $reason")
      }
      // ---- chain-sync phase ----
      val client = new ChainSyncWire.Client(candidates)
      writeAll(ch, client.start())
      val events = Vector.newBuilder[ChainSyncWire.Event]
      if (leftover.nonEmpty) {
        val (evs, out) = client.onBytes(leftover)
        evs.foreach { e => events += e; onEvent(e) }
        if (out.nonEmpty) writeAll(ch, out)
      }
      val buf = ByteBuffer.allocate(64 * 1024)
      var open = true
      while (open && !stop()) {
        forceRollbackSignal().foreach(p => writeAll(ch, client.forceRollback(p)))
        buf.clear()
        val n = ch.read(buf)
        if (n < 0) open = false
        else if (n > 0) {
          val chunk = new Array[Byte](n)
          buf.flip(); buf.get(chunk)
          val (evs, out) = client.onBytes(chunk)
          evs.foreach { e => events += e; onEvent(e) }
          if (out.nonEmpty) writeAll(ch, out)
        }
      }
      SessionLog(accepted, events.result())
    } finally ch.close()
  }

  private def writeAll(ch: SocketChannel, bytes: Array[Byte]): Unit = {
    if (bytes.nonEmpty) {
      val bb = ByteBuffer.wrap(bytes)
      while (bb.hasRemaining) ch.write(bb)
    }
  }

  /** Read until ONE complete CBOR handshake reply is reassembled (it may
    * span SDUs and arrive in arbitrary chunks); returns it plus any bytes
    * that followed it on the wire, which belong to the next phase. */
  private def readHandshakeReply(ch: SocketChannel): (Handshake.Result, Array[Byte]) = {
    var raw = Array.emptyByteArray    // transport bytes not yet parsed into SDUs
    var hs = Array.emptyByteArray     // reassembled handshake payload bytes
    val buf = ByteBuffer.allocate(4096)
    while (true) {
      val (sdus, rest) = Mux.decode(raw)
      raw = rest
      sdus.foreach { sdu =>
        require(sdu.protocolId == Handshake.ProtocolId,
          s"expected a handshake reply, got mini-protocol ${sdu.protocolId}")
        hs = hs ++ sdu.payload
      }
      graft.codec.Cbor.decodePrefix(hs) match {
        case Some((item, next)) =>
          require(next == hs.length,
            "unexpected handshake bytes after the reply")
          return (Handshake.parseReplyItem(item), raw)
        case None => ()
      }
      buf.clear()
      val n = ch.read(buf)
      require(n >= 0, "peer closed during the handshake")
      val chunk = new Array[Byte](n)
      buf.flip(); buf.get(chunk)
      raw = raw ++ chunk
    }
    sys.error("unreachable")
  }
}
