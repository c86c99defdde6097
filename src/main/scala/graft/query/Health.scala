package graft.query

import graft.index.GraftIndex

/** R12/R13 — the health, metrics, and response-caching layer, minus the
  * HTTP server itself (Warp is the one part of the reference that has no
  * Spark analogue; everything the endpoints RETURN is computed here).
  *
  * Health document: /root/reference/src/Kupo/Data/Health.hs:106-140
  * (field-ordered JSON encoding); Prometheus rendering :251-304;
  * ETag/304 discipline (`cacheOr`): /root/reference/src/Kupo/App/Http.hs:
  * 455-471 — the ETag is the most recent checkpoint's header hash, so any
  * indexed block invalidates every cached response at once. */
object Health {

  sealed abstract class ConnectionStatus(val json: String, val gauge: Int)
  object ConnectionStatus {
    case object Connected extends ConnectionStatus("connected", 1)
    case object Disconnected extends ConnectionStatus("disconnected", 0)
  }

  final case class Snapshot(
    connectionStatus: ConnectionStatus,
    mostRecentCheckpoint: Option[(Long, String)], // (slot, header hash)
    mostRecentNodeTip: Option[Long],
    secondsSinceLastBlock: Option[Long],
    version: String)

  /** Read the health snapshot off the index (one LIMIT-1 checkpoint scan).
    * `nodeTip`/`lastBlockAtMs` come from the producer loop, which is where
    * the reference's TVar gets its writes too (Health.hs:58-72). */
  def snapshot(ix: GraftIndex,
               status: ConnectionStatus = ConnectionStatus.Disconnected,
               nodeTip: Option[Long] = None,
               lastBlockAtMs: Option[Long] = None,
               nowMs: Long = System.currentTimeMillis()): Snapshot =
    Snapshot(
      connectionStatus = status,
      mostRecentCheckpoint = FoldInputs.maxCheckpoint(ix),
      mostRecentNodeTip = nodeTip,
      secondsSinceLastBlock = lastBlockAtMs.map(t => math.max(0L, (nowMs - t) / 1000L)),
      version = Version)

  /** GET /health body — field order and null conventions of the reference
    * encoder (Health.hs:108-140). `network_synchronization` needs the era
    * genesis parameters (a node-side input), so it is null here, exactly as
    * the reference renders it when network parameters are absent. */
  def asJson(h: Snapshot): String = {
    def orNull(v: Option[Long]) = v.map(_.toString).getOrElse("null")
    s"""{"connection_status":"${h.connectionStatus.json}",""" +
      s""""most_recent_checkpoint":${orNull(h.mostRecentCheckpoint.map(_._1))},""" +
      s""""most_recent_node_tip":${orNull(h.mostRecentNodeTip)},""" +
      s""""seconds_since_last_block":${orNull(h.secondsSinceLastBlock)},""" +
      s""""network_synchronization":null,""" +
      s""""configuration":{"indexes":null},""" +
      s""""version":"${h.version}"}"""
  }

  /** GET /metrics body (Health.hs:251-304): `kupo_`-prefixed samples, one
    * per line, absent when their source is absent. */
  def prometheus(h: Snapshot): String = {
    val lines = Seq(
      Some(s"kupo_connection_status ${h.connectionStatus.gauge}"),
      h.mostRecentCheckpoint.map(c => s"kupo_most_recent_checkpoint ${c._1}"),
      h.mostRecentNodeTip.map(t => s"kupo_most_recent_node_tip $t"),
      h.secondsSinceLastBlock.map(s => s"kupo_seconds_since_last_block $s")
    ).flatten
    lines.mkString("", "\n", "\n")
  }

  /** R13: the ETag of every cacheable response — most recent checkpoint's
    * header hash (Http.hs:465-467). */
  def etag(h: Snapshot): Option[String] = h.mostRecentCheckpoint.map(_._2)

  /** R13 `cacheOr` (Http.hs:455-471): with a matching `if-none-match` tag
    * the response body is not computed at all — `None` = 304 Not Modified;
    * otherwise the fresh result comes back with the current ETag to set on
    * the response. */
  def cacheOr[A](h: Snapshot, ifNoneMatch: Option[String])(fresh: => A): Option[(Option[String], A)] =
    ifNoneMatch match {
      case Some(tag) if etag(h).contains(tag) => None
      case _                                  => Some((etag(h), fresh))
    }

  val Version = "graft-0.4.0"
}
