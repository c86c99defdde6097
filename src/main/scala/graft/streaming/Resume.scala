package graft.streaming

import graft.index.{GraftIndex, Mutations}
import graft.query.FoldInputs

/** Application (re)start: checkpoint-based intersection negotiation —
  * the Spark answer to the reference's resume protocol
  * (startOrResume /root/reference/src/Kupo/App/Configuration.hs:182-240;
  * producer restart loop /root/reference/src/Kupo/App.hs:300-346).
  *
  * On boot the reference offers its log-spaced recent checkpoints (R6) to
  * the chain producer as intersection candidates; the producer answers with
  * the newest point it also knows, then replays from there — the first
  * message after (re)connection is a roll-backward to the intersection.
  * That handshake is what makes a crash recoverable ANYWHERE, including
  * mid-rollback: whatever half-applied state the index is in, the
  * negotiated intersection is a point both sides agree on, the index cuts
  * back to it, and replay reconverges. */
object Resume {

  final case class Point(slot: Long, headerHash: String)

  /** `--since` configuration (Configuration.hs `since`):
    * resume from checkpoints only, from an explicit point, or from the
    * producer's current tip. */
  sealed trait Since
  object Since {
    case object Unspecified extends Since
    final case class FromPoint(point: Point) extends Since
    case object FromTip extends Since
  }

  final case class NoStartingPointException()
    extends RuntimeException(
      "no --since provided and no checkpoints found in the index; an " +
        "explicit starting point (e.g. origin) is required on first launch")
  final case class ConflictingOptionsException()
    extends RuntimeException(
      "the --since point is more recent than every known checkpoint; " +
        "choose an older point or start from a fresh index")
  final case class IntersectionNotFoundException(offered: Seq[Point])
    extends RuntimeException(
      s"producer knows none of the ${offered.length} offered checkpoints")

  /** Mirror of Configuration.hs:192-240: returns (most recent known point,
    * intersection candidates newest-first). The candidates are the index's
    * log-spaced checkpoints (R6, `FoldInputs.listCheckpointsDesc`), merged
    * with the configured `--since` point when given; `fetchTip` is consulted
    * only for `FromTip` on an empty index. */
  def startOrResume(ix: GraftIndex, since: Since = Since.Unspecified,
                    fetchTip: () => Point = () => throw NoStartingPointException())
      : (Option[Point], Seq[Point]) = {
    val checkpoints = FoldInputs.listCheckpointsDesc(ix)
      .collect().map(r => Point(r.getLong(0), r.getString(1))).toSeq
    (since, checkpoints) match {
      case (Since.Unspecified, Nil) =>
        throw NoStartingPointException()
      case (Since.FromPoint(p), mostRecent +: _) =>
        if (p.slot > mostRecent.slot) throw ConflictingOptionsException()
        else (Some(mostRecent), (p +: checkpoints).sortBy(-_.slot))
      case (Since.Unspecified, mostRecent +: _) =>
        (Some(mostRecent), checkpoints)
      case (Since.FromPoint(p), Nil) =>
        (None, Seq(p))
      case (Since.FromTip, Nil) =>
        val tip = fetchTip()
        (Some(tip), Seq(tip))
      case (Since.FromTip, mostRecent +: _) =>
        (Some(mostRecent), checkpoints)
    }
  }

  /** Negotiate the intersection and ALIGN the index to it: `findIntersect`
    * is the producer side of chain-sync FindIntersect — given candidates
    * newest-first it answers the newest point on ITS chain (both slot and
    * header hash must match; a slot the producer reorged away does not
    * intersect). The index then rolls back to the agreed point, erasing any
    * half-applied suffix (crash mid-rollback leaves checkpoints ahead of
    * inputs — both are cut to the intersection), and the caller replays
    * forwards from there. Returns the intersection. */
  def negotiate(ix: GraftIndex, candidates: Seq[Point],
                findIntersect: Seq[Point] => Option[Point]): Point = {
    val intersection = findIntersect(candidates)
      .getOrElse(throw IntersectionNotFoundException(candidates))
    Mutations.rollbackTo(ix, intersection.slot)
    intersection
  }

  /** One-call restart: negotiate from the index's own checkpoints, align,
    * and hand the intersection to the caller to start its feeder from.
    * (App.hs:312-346 `restart` — reconnection re-runs the same handshake
    * with the forced-rollback point as the sole candidate.) */
  def resume(ix: GraftIndex, findIntersect: Seq[Point] => Option[Point],
             since: Since = Since.Unspecified,
             fetchTip: () => Point = () => throw NoStartingPointException()): Point = {
    val (_, candidates) = startOrResume(ix, since, fetchTip)
    negotiate(ix, candidates, findIntersect)
  }
}
