package graft.ingest

import graft.codec.{Blake2b, Cbor, Hex}
import graft.codec.Cbor._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1's data plane — whole ledger BLOCKS from CBOR, as exported by a node
  * (the SURVEY §7 design for the node producer: the Ouroboros socket
  * protocol itself has no Spark analogue, but everything it DELIVERS does:
  * batch/stream `spark.read` over pre-exported block files, one block CBOR
  * hex per line).
  *
  * Shelley-through-Conway block layout (era CDDLs):
  *   block = [header, transaction_bodies, transaction_witness_sets,
  *            auxiliary_data_set, invalid_transactions?]
  *   header = [header_body, body_signature];
  *   header_body = [block_number, slot, prev_hash, …]
  * The wire line may additionally carry the node-to-client era wrapper
  * `[era_id, block]` (block either inline or as a tag-24 byte envelope).
  * Identity rules: header hash = blake2b-256 of the header item's wire
  * bytes; tx ids/datum/script hashes via `TxCbor`; a tx index listed in
  * `invalid_transactions` ingests through the collateral flow (phase-2
  * failure), exactly like Ogmios's `"spends":"collaterals"`.
  * Auxiliary data re-emerges as Ogmios-shaped metadata: hash = blake2b-256
  * of the aux item, labels rendered as `{"cbor": hex}` metadatum wires
  * (the form `metadatum_schema` and R11 already consume). Byron blocks are
  * out of scope (different structure entirely, no UTxO entries the index
  * would keep). */
object BlockCbor {

  /** One block CBOR hex line → one Ogmios nextBlock line; null when the
    * bytes are not a recognizable Shelley+ block. */
  def blockToOgmios(cborHex: String): String =
    try {
      val outer = Hex.decode(cborHex).getOrElse(sys.error("bad hex"))
      val (bytes, block) = locateBlock(outer)
      val header = block.items(0) match { case a: CArr => a; case x => sys.error(s"bad header: $x") }
      val headerBody = header.items(0) match { case a: CArr => a; case x => sys.error(s"bad header body: $x") }
      val height = headerBody.items(0) match { case CInt(n, _, _) => n; case x => sys.error(s"bad height: $x") }
      val slot = headerBody.items(1) match { case CInt(n, _, _) => n; case x => sys.error(s"bad slot: $x") }
      val headerHash = Hex.encode(Blake2b.hash256(Cbor.slice(bytes, header)))

      val bodies = arr(block.items(1))
      val witSets = arr(block.items(2))
      val auxSet = block.items(3) match { case m: CMap => m; case _ => CMap(Vector.empty, 0, 0) }
      val invalid: Set[Int] = block.items.lift(4).map(arr(_).map {
        case CInt(i, _, _) => i.toInt
        case x             => sys.error(s"bad invalid index: $x")
      }.toSet).getOrElse(Set.empty)

      val txs = bodies.zipWithIndex.map { case (b, i) =>
        val body = b match { case m: CMap => m; case x => sys.error(s"bad tx body: $x") }
        val wits = witSets.lift(i) match { case Some(m: CMap) => m; case _ => CMap(Vector.empty, 0, 0) }
        val metadata = auxSet.entries.collectFirst {
          case (CInt(k, _, _), aux) if k == i => metadataJson(bytes, aux)
        }.flatten
        TxCbor.decodeTxParts(bytes, body, wits, isValid = !invalid(i), metadata).json
      }
      s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"forward",""" +
        s""""block":{"id":"$headerHash","slot":$slot,"height":$height,""" +
        s""""transactions":[${txs.mkString(",")}]},""" +
        s""""tip":{"slot":$slot,"id":"$headerHash"}}}"""
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Unwrap the optional `[era_id, block]` node-to-client envelope; a
    * tag-24 byte payload restarts span accounting on the inner bytes. */
  private def locateBlock(outer: Array[Byte]): (Array[Byte], CArr) =
    Cbor.decode(outer) match {
      case CArr(Vector(CInt(_, _, _), inner), _, _) => inner match {
        case a: CArr if a.items.size >= 4 => (outer, a)
        case CTag(24, CBytes(b, _, _), _, _) => Cbor.decode(b) match {
          case a: CArr if a.items.size >= 4 => (b, a)
          case x                            => sys.error(s"bad wrapped block: $x")
        }
        case x => sys.error(s"bad era-wrapped block: $x")
      }
      case a: CArr if a.items.size >= 4 => (outer, a)
      case x                            => sys.error(s"not a block: $x")
    }

  private def arr(i: Item): Vector[Item] = i match {
    case CArr(items, _, _)                  => items
    case CTag(258, CArr(items, _, _), _, _) => items
    case x                                  => sys.error(s"expected array: $x")
  }

  /** Auxiliary data → Ogmios metadata object. Era shapes: Shelley = the
    * metadata map itself; Allegra/Mary = [metadata, native_scripts];
    * Alonzo+ = #6.259({0: metadata, 1+: scripts}). Labels render as
    * `{"cbor": hex}` of the metadatum item's wire bytes — the exact form
    * the metadatum kernel decodes; hash = blake2b-256 of the whole aux
    * item (the ledger's auxiliary data hash). */
  private def metadataJson(bytes: Array[Byte], aux: Item): Option[String] = {
    val metadataMap: Option[CMap] = aux match {
      case m: CMap => Some(m)
      case CArr(items, _, _) => items.headOption.collect { case m: CMap => m }
      case CTag(259, m: CMap, _, _) =>
        m.entries.collectFirst { case (CInt(k, _, _), mm: CMap) if k == 0 => mm }
      case _ => None
    }
    metadataMap.filter(_.entries.nonEmpty).map { mm =>
      val hash = Hex.encode(Blake2b.hash256(Cbor.slice(bytes, aux)))
      val labels = mm.entries.map {
        case (CInt(label, _, _), datum) =>
          s""""$label":{"cbor":"${Hex.encode(Cbor.slice(bytes, datum))}"}"""
        case other => sys.error(s"bad metadata label: $other")
      }.mkString(",")
      s"""{"hash":"$hash","labels":{$labels}}"""
    }
  }

  /** Declarative bridge: raw block-CBOR hex lines → raw Ogmios lines. */
  def toOgmiosLines(raw: DataFrame): DataFrame =
    raw.select(graft.GraftFunctions.blockCborToOgmios(col("raw")).as("raw"))
      .where(col("raw").isNotNull)

  /** Batch entry: file(s) of block CBOR hex lines → normalized blocks. */
  def readCborBlocks(spark: SparkSession, path: String): DataFrame = {
    val og = toOgmiosLines(spark.read.text(path).withColumnRenamed("value", "raw"))
    BlockReader.blocks(BlockReader.parseEnvelope(og))
  }
}
