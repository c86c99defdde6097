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
  * (the form `metadatum_schema` and R11 already consume).
  *
  * Byron blocks (the first era a `--since origin` replay sees) are decoded
  * too, mirroring the reference's fold
  * (/root/reference/src/Kupo/Data/Cardano.hs:175-181 extractTxs over
  * BlockByron, :203-230 Byron inputs/outputs): Byron CDDL
  * `block = [0, ebblock] / [1, mainblock]`,
  * `mainblock = [header, body, extra]`,
  * `body = [tx_payload, ssc, dlg, upd]`, `tx_payload = [* [tx, witnesses]]`,
  * `tx = [[+ txin], [+ txout], attributes]`,
  * `txin = [0, #6.24(bytes .cbor [txid, u32])]`,
  * `txout = [address, u64]`. Byron txs carry no datums, scripts, collateral
  * or metadata; protocol payloads (ssc/dlg/upd votes) are ignored exactly
  * like the reference's `ignoreProtocolTxs`. Identity rules: tx id =
  * blake2b-256 of the tx item's wire bytes; header hash = blake2b-256 of
  * the re-tagged pair `[variant, header]` (the ledger hashes the
  * variant-wrapped header, not the bare one). The output address hex is the
  * wire CBOR of the `[#6.24(payload), crc]` envelope — exactly the
  * bootstrap on-chain bytes `Address.fromOnChainBytes` already normalizes,
  * so bootstrap outputs index under `*` (P1) with no special casing
  * downstream. Absolute slot = epoch · 21600 + slot (Byron mainnet epoch
  * length, 10·k with k = 2160); epoch-boundary blocks (variant 0) yield an
  * empty transaction list at the epoch's first slot, matching the
  * reference's empty `extractTxs`. */
object BlockCbor {

  /** One block CBOR hex line → one Ogmios nextBlock line; null when the
    * bytes are not a recognizable block of any era. */
  def blockToOgmios(cborHex: String): String =
    try {
      val outer = Hex.decode(cborHex).getOrElse(sys.error("bad hex"))
      val (bytes, block) = locateBlock(outer)
      if (isByronVariant(block)) byronToOgmios(bytes, block)
      else shelleyToOgmios(bytes, block)
    } catch { case scala.util.control.NonFatal(_) => null }

  private def shelleyToOgmios(bytes: Array[Byte], block: CArr): String = {
    {
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
      nextBlockLine(headerHash, slot, height, txs)
    }
  }

  private def nextBlockLine(headerHash: String, slot: BigInt, height: BigInt,
                            txs: Seq[String]): String =
    s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"forward",""" +
      s""""block":{"id":"$headerHash","slot":$slot,"height":$height,""" +
      s""""transactions":[${txs.mkString(",")}]},""" +
      s""""tip":{"slot":$slot,"id":"$headerHash"}}}"""

  // ---- Byron ----

  /** Byron mainnet epoch length in slots (10·k, k = 2160) — the factor the
    * consensus layer uses to flatten `slotid = [epoch, slot]` into an
    * absolute SlotNo. A config parameter on other networks; constant here
    * (the data plane reads pre-exported mainnet-shaped files). */
  private val ByronEpochSlots = BigInt(21600)

  /** `block = [0, ebblock] / [1, mainblock]` — a two-item array whose head
    * is the variant tag. Shelley+ blocks have >= 4 items, so the shapes
    * never collide. */
  private def isByronVariant(a: CArr): Boolean =
    a.items.size == 2 && (a.items(0) match {
      case CInt(v, _, _) => (v == 0 || v == 1) && a.items(1).isInstanceOf[CArr]
      case _             => false
    })

  private def byronToOgmios(bytes: Array[Byte], block: CArr): String = {
    val variant = block.items(0) match { case CInt(v, _, _) => v.toInt; case x => sys.error(s"bad byron variant: $x") }
    val inner = block.items(1) match { case a: CArr if a.items.size >= 2 => a; case x => sys.error(s"bad byron block: $x") }
    val header = inner.items(0) match { case a: CArr => a; case x => sys.error(s"bad byron header: $x") }
    // the ledger hashes the VARIANT-WRAPPED header: blake2b-256 of
    // CBOR [variant, header] — re-tag with the 2-array + small-uint heads
    val headerHash = Hex.encode(Blake2b.hash256(
      Array(0x82.toByte, variant.toByte) ++ Cbor.slice(bytes, header)))
    // main consensus = [slotid, pubkey, difficulty, sig]; ebb = [epoch, difficulty]
    val consensus = header.items.lift(3) match { case Some(a: CArr) => a; case x => sys.error(s"bad consensus: $x") }
    val (slot, difficulty) =
      if (variant == 1) {
        val slotid = consensus.items(0) match { case a: CArr => a; case x => sys.error(s"bad slotid: $x") }
        val epoch = slotid.items(0) match { case CInt(e, _, _) => e; case x => sys.error(s"bad epoch: $x") }
        val rel = slotid.items(1) match { case CInt(s, _, _) => s; case x => sys.error(s"bad slot: $x") }
        (epoch * ByronEpochSlots + rel, consensus.items(2))
      } else {
        val epoch = consensus.items(0) match { case CInt(e, _, _) => e; case x => sys.error(s"bad ebb epoch: $x") }
        (epoch * ByronEpochSlots, consensus.items(1))
      }
    val height = difficulty match {
      case CArr(Vector(CInt(d, _, _)), _, _) => d // ChainDifficulty = [u64]
      case CInt(d, _, _)                     => d
      case x                                 => sys.error(s"bad difficulty: $x")
    }
    // EBBs carry no transactions (reference extractTxs → []); main blocks:
    // body = [tx_payload, ssc, dlg, upd], protocol payloads ignored
    val txs: Seq[String] =
      if (variant == 0) Seq.empty
      else {
        val body = inner.items(1) match { case a: CArr => a; case x => sys.error(s"bad byron body: $x") }
        arr(body.items(0)).map(byronTxJson(bytes, _))
      }
    nextBlockLine(headerHash, slot, height, txs)
  }

  /** One `txaux = [tx, witnesses]`; `tx = [[+ txin], [+ txout], attrs]`.
    * No datums/scripts/metadata/collateral in this era — always
    * `"spends":"inputs"` (Byron has no phase-2 validation). */
  private def byronTxJson(bytes: Array[Byte], txaux: Item): String = {
    val tx = arr(txaux).headOption match {
      case Some(a: CArr) if a.items.size >= 2 => a
      case x                                  => sys.error(s"bad byron txaux: $x")
    }
    val idHex = Hex.encode(Blake2b.hash256(Cbor.slice(bytes, tx)))
    val inputs = arr(tx.items(0)).map {
      // txin = [0, #6.24(bytes .cbor [txid, u32])]
      case CArr(Vector(CInt(v, _, _), CTag(24, CBytes(b, _, _), _, _)), _, _) if v == 0 =>
        Cbor.decode(b) match {
          case CArr(Vector(CBytes(txId, _, _), CInt(ix, _, _)), _, _) =>
            s"""{"transaction":{"id":"${Hex.encode(txId)}"},"index":$ix}"""
          case x => sys.error(s"bad byron txin payload: $x")
        }
      case x => sys.error(s"bad byron txin: $x")
    }
    val outputs = arr(tx.items(1)).map {
      // txout = [address, u64]; the address hex is the wire CBOR of the
      // whole [#6.24(payload), crc] envelope = bootstrap on-chain bytes
      case CArr(Vector(addr: CArr, CInt(amount, _, _)), _, _) =>
        s"""{"address":"${Hex.encode(Cbor.slice(bytes, addr))}",""" +
          s""""value":{"ada":{"lovelace":$amount}}}"""
      case x => sys.error(s"bad byron txout: $x")
    }
    s"""{"id":"$idHex","spends":"inputs","inputs":[${inputs.mkString(",")}],""" +
      s""""outputs":[${outputs.mkString(",")}]}"""
  }

  /** Unwrap the optional `[era_id, block]` node-to-client envelope; a
    * tag-24 byte payload restarts span accounting on the inner bytes.
    * Byron lines may arrive bare (`[variant, block]`), era-wrapped inline,
    * or era-wrapped under tag 24 — all three land here. */
  private def locateBlock(outer: Array[Byte]): (Array[Byte], CArr) =
    Cbor.decode(outer) match {
      case top @ CArr(Vector(CInt(_, _, _), inner), _, _) => inner match {
        case a: CArr if a.items.size >= 4 => (outer, a)
        case CTag(24, CBytes(b, _, _), _, _) => Cbor.decode(b) match {
          case a: CArr if a.items.size >= 4 || isByronVariant(a) => (b, a)
          case x => sys.error(s"bad wrapped block: $x")
        }
        case a: CArr if isByronVariant(a) => (outer, a) // era-wrapped byron
        case _: CArr if isByronVariant(top) => (outer, top) // bare byron block
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

  /** Declarative bridge: raw block-CBOR hex lines → raw Ogmios lines.
    * Every line here MUST be a block, so in strict mode (default) an
    * undecodable line fails the job at that exact row via `raise_error`
    * with a prefix of the offending hex — a decoder bug or unhandled era
    * shape can never silently gap the chain (the reference fails loudly on
    * undecodable blocks). `strict = false` restores drop-malformed for
    * exploratory reads. */
  def toOgmiosLines(raw: DataFrame, strict: Boolean = true): DataFrame = {
    val decoded = graft.GraftFunctions.blockCborToOgmios(col("raw"))
    val guarded =
      if (strict)
        when(decoded.isNull, raise_error(
          concat(lit("undecodable block CBOR (hex prefix): "), substring(col("raw"), 1, 96))))
          .otherwise(decoded)
      else decoded
    raw.select(guarded.as("raw")).where(col("raw").isNotNull)
  }

  /** Batch entry: file(s) of block CBOR hex lines → normalized blocks. */
  def readCborBlocks(spark: SparkSession, path: String, strict: Boolean = true): DataFrame = {
    val og = toOgmiosLines(spark.read.text(path).withColumnRenamed("value", "raw"), strict)
    BlockReader.blocks(BlockReader.parseEnvelope(og))
  }
}
