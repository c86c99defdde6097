package graft.ingest

import graft.codec.{Blake2b, Cbor, Hex}
import graft.codec.Cbor._

/** Babbage/Conway-era transaction CBOR → the Ogmios wire-JSON shape that
  * `BlockReader` already normalizes — the era-specific ledger extraction the
  * Hydra producer needs (/root/reference/src/Kupo/Data/Hydra.hs:178-221
  * decodes the same `cborHex` with the Conway ledger decoders; here the
  * relevant CDDL subset is read directly and re-expressed as wire JSON so
  * ONE ingest pipeline serves both producers).
  *
  * Identity rules mirrored from the ledger:
  *  - transaction id  = blake2b-256 of the BODY item's wire bytes;
  *  - datum hash      = blake2b-256 of the plutus-data item's wire bytes;
  *  - script hash     = blake2b-224 of (language tag byte ‖ script bytes),
  *    with native scripts hashed over their wire CBOR (tag 00).
  * CDDL shapes handled: tag-258 sets, legacy array outputs and Babbage map
  * outputs, datum_option hash/inline, tag-24 wrapped reference scripts,
  * array- and map-form redeemers, collateral inputs + return for phase-2
  * invalid transactions. */
object TxCbor {

  final case class DecodedTx(idHex: String, json: String)

  /** Decode one transaction; None when the bytes are not a recognizable
    * Babbage/Conway transaction. */
  def decodeTx(cborHex: String): Option[DecodedTx] =
    try {
      val bytes = Hex.decode(cborHex).getOrElse(return None)
      val top = Cbor.decode(bytes) match {
        case a: CArr if a.items.size >= 2 => a
        case _                            => return None
      }
      val body = top.items(0) match { case m: CMap => m; case _ => return None }
      val wits = top.items(1) match { case m: CMap => m; case _ => CMap(Vector.empty, 0, 0) }
      val isValid = top.items.lift(2) match {
        case Some(CSimple(20, _, _)) => false // false ⇒ phase-2 invalid
        case _                       => true
      }
      Some(decodeTxParts(bytes, body, wits, isValid, metadata = None))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Assemble a tx from already-located parts — the shared core of the
    * standalone-tx path above and the whole-block path (`BlockCbor`), where
    * bodies and witness sets live in separate top-level block arrays.
    * `metadata` is the pre-rendered Ogmios metadata object, if any. */
  private[ingest] def decodeTxParts(bytes: Array[Byte], body: CMap, wits: CMap,
                                    isValid: Boolean, metadata: Option[String]): DecodedTx = {
    {
      val idHex = Hex.encode(Blake2b.hash256(Cbor.slice(bytes, body)))

      val inputs = mapGet(body, 0).map(setItems).getOrElse(Vector.empty).map(inputJson)
      val outputs = mapGet(body, 1).map(arrItems).getOrElse(Vector.empty).map(outputJson)
      val collaterals = mapGet(body, 13).map(setItems).getOrElse(Vector.empty).map(inputJson)
      val collateralReturn = mapGet(body, 16).map(outputJson)

      val datums = mapGet(wits, 4).map(setItems).getOrElse(Vector.empty).map { d =>
        val span = Cbor.slice(bytes, d)
        Hex.encode(Blake2b.hash256(span)) -> Hex.encode(span)
      }
      val scripts =
        mapGet(wits, 1).map(setItems).getOrElse(Vector.empty).map { s =>
          val span = Cbor.slice(bytes, s)
          val hash = Hex.encode(Blake2b.hash224(0x00.toByte +: span))
          hash -> s"""{"language":"native","json":${nativeJson(s)}}"""
        } ++
          plutusWitnesses(wits, bytes, key = 3, v = 1) ++
          plutusWitnesses(wits, bytes, key = 6, v = 2) ++
          plutusWitnesses(wits, bytes, key = 7, v = 3)
      val redeemers = mapGet(wits, 5).toSeq.flatMap(redeemerJsons(bytes, _))

      val fields = Seq.newBuilder[String]
      fields += s""""id":"$idHex""""
      fields += s""""spends":"${if (isValid) "inputs" else "collaterals"}""""
      fields += s""""inputs":[${inputs.mkString(",")}]"""
      if (collaterals.nonEmpty) fields += s""""collaterals":[${collaterals.mkString(",")}]"""
      fields += s""""outputs":[${outputs.mkString(",")}]"""
      collateralReturn.foreach(cr => fields += s""""collateralReturn":$cr""")
      if (datums.nonEmpty)
        fields += s""""datums":{${datums.map { case (h, d) => s""""$h":"$d"""" }.mkString(",")}}"""
      if (scripts.nonEmpty)
        fields += s""""scripts":{${scripts.map { case (h, s) => s""""$h":$s""" }.mkString(",")}}"""
      if (redeemers.nonEmpty) fields += s""""redeemers":[${redeemers.mkString(",")}]"""
      metadata.foreach(m => fields += s""""metadata":$m""")
      DecodedTx(idHex, fields.result().mkString("{", ",", "}"))
    }
  }

  // ---- pieces ----

  /** Conway wraps sets in tag 258; earlier eras use plain arrays. */
  private def setItems(i: Item): Vector[Item] = i match {
    case CTag(258, CArr(items, _, _), _, _) => items
    case CArr(items, _, _)                  => items
    case other                              => sys.error(s"expected set/array: $other")
  }

  private def arrItems(i: Item): Vector[Item] = i match {
    case CArr(items, _, _) => items
    case other             => sys.error(s"expected array: $other")
  }

  private def mapGet(m: CMap, key: Long): Option[Item] =
    m.entries.collectFirst { case (CInt(k, _, _), v) if k == key => v }

  private def inputJson(i: Item): String = i match {
    case CArr(Vector(CBytes(txId, _, _), CInt(ix, _, _)), _, _) =>
      s"""{"transaction":{"id":"${Hex.encode(txId)}"},"index":$ix}"""
    case other => sys.error(s"malformed input: $other")
  }

  private def valueJson(v: Item): String = v match {
    case CInt(coins, _, _) => s"""{"ada":{"lovelace":$coins}}"""
    case CArr(Vector(CInt(coins, _, _), ma: CMap), _, _) =>
      val policies = ma.entries.map {
        case (CBytes(p, _, _), assets: CMap) =>
          val as = assets.entries.map {
            case (CBytes(a, _, _), CInt(q, _, _)) => s""""${Hex.encode(a)}":$q"""
            case other                            => sys.error(s"malformed asset: $other")
          }.mkString(",")
          s""""${Hex.encode(p)}":{$as}"""
        case other => sys.error(s"malformed policy: $other")
      }.mkString(",")
      s"""{"ada":{"lovelace":$coins}${if (policies.nonEmpty) "," + policies else ""}}"""
    case other => sys.error(s"malformed value: $other")
  }

  private def outputJson(o: Item): String = {
    val fields = Seq.newBuilder[String]
    o match {
      // legacy (pre-Babbage) array form: [address, value, ?datum_hash]
      case CArr(items, _, _) if items.nonEmpty =>
        val addr = items(0) match {
          case CBytes(b, _, _) => Hex.encode(b); case x => sys.error(s"bad address: $x")
        }
        fields += s""""address":"$addr""""
        fields += s""""value":${valueJson(items(1))}"""
        items.lift(2).foreach {
          case CBytes(h, _, _) => fields += s""""datumHash":"${Hex.encode(h)}""""
          case x               => sys.error(s"bad datum hash: $x")
        }
      // Babbage map form: {0: address, 1: value, 2: datum_option, 3: script_ref}
      case m: CMap =>
        val addr = mapGet(m, 0) match {
          case Some(CBytes(b, _, _)) => Hex.encode(b); case x => sys.error(s"bad address: $x")
        }
        fields += s""""address":"$addr""""
        fields += s""""value":${valueJson(mapGet(m, 1).getOrElse(sys.error("no value")))}"""
        mapGet(m, 2).foreach {
          case CArr(Vector(CInt(k, _, _), d), _, _) => (k.toInt, d) match {
            case (0, CBytes(h, _, _)) => fields += s""""datumHash":"${Hex.encode(h)}""""
            case (1, CTag(24, CBytes(data, _, _), _, _)) =>
              fields += s""""datum":"${Hex.encode(data)}""""
            case other => sys.error(s"bad datum option: $other")
          }
          case other => sys.error(s"bad datum option: $other")
        }
        mapGet(m, 3).foreach {
          case CTag(24, CBytes(inner, _, _), _, _) =>
            fields += s""""script":${scriptJsonFromWrapped(inner)}"""
          case other => sys.error(s"bad script ref: $other")
        }
      case other => sys.error(s"malformed output: $other")
    }
    fields.result().mkString("{", ",", "}")
  }

  /** `script = [0, native_script] / [1..3, plutus bytes]` (already unwrapped
    * from its tag-24 byte envelope). Public: the Hydra genesis UTxO carries
    * the same shape as a hex field. */
  def scriptJsonFromWrapped(inner: Array[Byte]): String =
    Cbor.decode(inner) match {
      case CArr(Vector(CInt(k, _, _), s), _, _) => (k.toInt, s) match {
        case (0, native) => s"""{"language":"native","json":${nativeJson(native)}}"""
        case (n, CBytes(b, _, _)) if n >= 1 && n <= 3 =>
          s"""{"language":"plutus:v$n","cbor":"${Hex.encode(b)}"}"""
        case other => sys.error(s"bad script: $other")
      }
      case other => sys.error(s"bad script: $other")
    }

  /** Timelock CBOR → the clause-tree JSON `native_script_cbor` serializes
    * back; the two are exact inverses, so the recomputed hash matches. */
  private def nativeJson(i: Item): String = i match {
    case CArr(items, _, _) => (items.head, items.tail) match {
      case (CInt(k, _, _), rest) => k.toInt match {
        case 0 => rest match {
          case Vector(CBytes(h, _, _)) =>
            s"""{"clause":"signature","from":"${Hex.encode(h)}"}"""
          case other => sys.error(s"bad sig clause: $other")
        }
        case 1 => s"""{"clause":"all","from":[${subScripts(rest)}]}"""
        case 2 => s"""{"clause":"any","from":[${subScripts(rest)}]}"""
        case 3 => rest match {
          case Vector(CInt(n, _, _), subs) =>
            s"""{"clause":"some","atLeast":$n,"from":[${subScripts(Vector(subs))}]}"""
          case other => sys.error(s"bad some clause: $other")
        }
        case 4 => rest match {
          case Vector(CInt(slot, _, _)) => s"""{"clause":"after","slot":$slot}"""
          case other                    => sys.error(s"bad after clause: $other")
        }
        case 5 => rest match {
          case Vector(CInt(slot, _, _)) => s"""{"clause":"before","slot":$slot}"""
          case other                    => sys.error(s"bad before clause: $other")
        }
        case other => sys.error(s"unknown native clause: $other")
      }
      case other => sys.error(s"bad native script: $other")
    }
    case other => sys.error(s"bad native script: $other")
  }

  private def subScripts(rest: Vector[Item]): String = rest match {
    case Vector(CArr(subs, _, _)) => subs.map(nativeJson).mkString(",")
    case other                    => sys.error(s"bad sub-scripts: $other")
  }

  private def plutusWitnesses(wits: CMap, bytes: Array[Byte],
                              key: Long, v: Int): Vector[(String, String)] =
    mapGet(wits, key).map(setItems).getOrElse(Vector.empty).map {
      case CBytes(b, _, _) =>
        val hash = Hex.encode(Blake2b.hash224(v.toByte +: b))
        hash -> s"""{"language":"plutus:v$v","cbor":"${Hex.encode(b)}"}"""
      case other => sys.error(s"bad plutus witness: $other")
    }

  /** Redeemers: legacy array `[[tag, index, data, ex_units]]` or Conway map
    * `{[tag, index] → [data, ex_units]}`. Only spend (tag 0) is emitted —
    * the only purpose the index consumes (MatchBlock filters on it). */
  private def redeemerJsons(bytes: Array[Byte], item: Item): Seq[String] = {
    def one(tag: BigInt, ix: BigInt, data: Item): Option[String] =
      if (tag != BigInt(0)) None
      else Some(
        s"""{"validator":{"purpose":"spend","index":$ix},""" +
          s""""redeemer":"${Hex.encode(Cbor.slice(bytes, data))}"}""")
    item match {
      case CArr(items, _, _) => items.flatMap {
        case CArr(Vector(CInt(tag, _, _), CInt(ix, _, _), data, _), _, _) => one(tag, ix, data)
        case other => sys.error(s"bad redeemer: $other")
      }
      case CMap(entries, _, _) => entries.flatMap {
        case (CArr(Vector(CInt(tag, _, _), CInt(ix, _, _)), _, _),
              CArr(Vector(data, _), _, _)) => one(tag, ix, data)
        case other => sys.error(s"bad redeemer entry: $other")
      }
      case other => sys.error(s"bad redeemers: $other")
    }
  }
}
