package graft.query

/** Typed query-parameter surface of GET /matches/{pattern} — mirrors the
  * reference's Http query-param modules (SURVEY.md §2.3):
  * SlotRange (/root/reference/src/Kupo/Data/Http/SlotRange.hs:34-97),
  * StatusFlag (StatusFlag.hs:26-42), ReferenceFlag (ReferenceFlag.hs:13-28),
  * OrderMatchesBy (OrderMatchesBy.hs:13-42), FilterMatchesBy (FilterMatchesBy.hs:25-102). */
object Api {

  sealed trait RangeField
  object RangeField {
    case object CreatedAt extends RangeField
    case object SpentAt extends RangeField
  }

  /** Whole / After / Before / Between over created_at or spent_at. Bounds
    * given as full POINTS (slot + header hash) are existence-checked against
    * checkpoints before the query runs (intoSlotRange SlotRange.hs:69-97;
    * assertion Http.hs:631-643 → ErrPointNotFound / ErrPointMismatch). */
  final case class SlotRange(
      field: RangeField = RangeField.CreatedAt,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      lowerBoundHash: Option[String] = None,
      upperBoundHash: Option[String] = None)

  final case class PointNotFound(slot: Long)
    extends RuntimeException(s"no known checkpoint at slot $slot")
  final case class PointMismatch(slot: Long, expected: String, actual: String)
    extends RuntimeException(
      s"checkpoint at slot $slot has header $actual, not $expected")

  sealed trait StatusFlag
  object StatusFlag {
    case object NoStatusFlag extends StatusFlag
    case object OnlyUnspent extends StatusFlag
    case object OnlySpent extends StatusFlag
  }

  sealed trait SortDirection
  object SortDirection {
    case object Asc extends SortDirection
    /** Default: most_recent_first (OrderMatchesBy.hs:26-42). */
    case object Desc extends SortDirection
  }

  /** Residual ?policy_id= / ?asset_name= / ?transaction_id= / ?output_index=
    * filters, applied as extra conjuncts (the reference applies them per-row
    * after the scan — Http.hs:662-684; here Catalyst folds them into the scan). */
  final case class FilterMatchesBy(
      policyId: Option[String] = None,
      assetName: Option[String] = None,
      transactionId: Option[String] = None,
      outputIndex: Option[Int] = None)

  final case class MatchesQuery(
      patternText: String,
      range: SlotRange = SlotRange(),
      status: StatusFlag = StatusFlag.NoStatusFlag,
      resolveHashes: Boolean = false,
      order: SortDirection = SortDirection.Desc,
      filter: FilterMatchesBy = FilterMatchesBy())

  /** 400-style error body for the library's typed failures — the shape an
    * HTTP layer serializes (`{"hint": …}`, BadRequest in the OpenAPI
    * document; reference encoder /root/reference/src/Kupo/Data/Http/Error.hs:
    * 33-43). The hint is the failure's message with JSON string escaping. */
  def errorJson(e: Throwable): String = {
    val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
    val escaped = msg.flatMap {
      case '"'            => "\\\""
      case '\\'           => "\\\\"
      case '\n'           => "\\n"
      case '\r'           => "\\r"
      case '\t'           => "\\t"
      case c if c < ' '   => f"\\u${c.toInt}%04x"
      case c              => c.toString
    }
    s"""{"hint":"$escaped"}"""
  }
}
