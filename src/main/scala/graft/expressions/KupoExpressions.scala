package graft.expressions

import graft.codec.{Base58, Bech32, Blake2b, Hex}
import graft.model.Address
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static, codegen-callable kernels for the ingest hot path. Every produced
  * output at 100 TB ingest passes through address normalization and (when
  * datums/scripts are inline) blake2b hashing; as native Catalyst
  * expressions these stay inside WholeStageCodegen — no UDF
  * serialization/boxing boundary, no codegen fence (SURVEY.md §4: the one
  * perf-only custom-Expression candidate). Semantics are byte-identical to
  * the graft.codec/graft.model functions they wrap. */
object Kernels {
  /** Shared Jackson mapper — thread-safe for readTree/writeValueAsString;
    * per-row construction would dominate the kernels' cost at ingest scale. */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Wire address text (bech32 / base58 Byron / raw hex) → kupo hex form,
    * null when unparseable — the decodeAddress semantics
    * (/root/reference/src/Kupo/Data/Ogmios.hs:349-358). */
  def normalizeAddress(txt: UTF8String): UTF8String = {
    if (txt == null) return null
    val s = txt.toString
    val viaBech32 = Bech32.decode(s).flatMap { case (hrp, bytes) =>
      if (hrp.startsWith("addr")) Address.fromOnChainBytes(bytes) else None
    }
    def viaHex = Hex.decode(s).flatMap(Address.fromOnChainBytes)
    def viaBase58 = Base58.decode(s).flatMap { bytes =>
      // full Byron CBOR-envelope + CRC validation, same as the pattern path
      if (Address.isValidByron(bytes)) Some("00" + Hex.encode(bytes))
      else None
    }
    viaBech32.orElse(viaHex).orElse(viaBase58)
      .map(UTF8String.fromString).orNull
  }

  /** blake2b digest of a hex payload, hex out; null on invalid hex. */
  def blake2bHex(hexIn: UTF8String, outLen: Int): UTF8String = {
    if (hexIn == null) return null
    Hex.decode(hexIn.toString)
      .map(b => UTF8String.fromString(Hex.encode(Blake2b.hash(outLen, b))))
      .orNull
  }

  /** Native-script clause JSON → tag-prefixed ("00" ‖ CBOR) hex, the same
    * bytes the reference obtains via decodeNativeScript + the ledger's
    * Timelock serialization (/root/reference/src/Kupo/Data/Ogmios.hs:320-365;
    * byte layout pinned by the native rows of
    * /root/reference/test/vectors/scripts.csv). Encoding, all lists
    * definite-length:
    *   signature  → [0, keyhash-bytes]      all  → [1, [subscripts…]]
    *   any        → [2, [subscripts…]]      some → [3, atLeast, [subscripts…]]
    *   after s    → [4, s]                  before s → [5, s]
    * Null on malformed clause trees (decoder-failure semantics). Uses the
    * Jackson shipped with Spark — no extra dependency. */
  def nativeScriptCbor(json: UTF8String): UTF8String = {
    if (json == null) return null
    try {
      val root = mapper.readTree(json.toString)
      val out = new java.io.ByteArrayOutputStream()
      def head(major: Int, v: Long): Unit = {
        val mt = major << 5
        if (v < 24) out.write(mt | v.toInt)
        else if (v < 256) { out.write(mt | 24); out.write(v.toInt) }
        else if (v < 65536) { out.write(mt | 25); out.write((v >> 8).toInt); out.write((v & 0xff).toInt) }
        else if (v <= 0xffffffffL) {
          out.write(mt | 26)
          var s = 24; while (s >= 0) { out.write(((v >> s) & 0xff).toInt); s -= 8 }
        } else {
          out.write(mt | 27)
          var s = 56; while (s >= 0) { out.write(((v >> s) & 0xff).toInt); s -= 8 }
        }
      }
      def children(node: com.fasterxml.jackson.databind.JsonNode): Unit = {
        val xs = node.get("from")
        head(4, xs.size().toLong)
        val it = xs.elements(); while (it.hasNext) encode(it.next())
      }
      def encode(node: com.fasterxml.jackson.databind.JsonNode): Unit =
        node.get("clause").asText() match {
          case "signature" =>
            val h = Hex.decode(node.get("from").asText())
              .filter(_.length == 28).getOrElse(sys.error("bad keyhash"))
            head(4, 2); head(0, 0); head(2, h.length.toLong); out.write(h)
          case "all"  => head(4, 2); head(0, 1); children(node)
          case "any"  => head(4, 2); head(0, 2); children(node)
          case "some" =>
            head(4, 3); head(0, 3); head(0, node.get("atLeast").asLong()); children(node)
          case "after"  => head(4, 2); head(0, 4); head(0, node.get("slot").asLong())
          case "before" => head(4, 2); head(0, 5); head(0, node.get("slot").asLong())
          case other => sys.error(s"unrecognized clause: $other")
        }
      encode(root)
      UTF8String.fromString("00" + Hex.encode(out.toByteArray))
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Wire metadatum ({"cbor": hex} | {"json": value},
    * /root/reference/src/Kupo/Data/Ogmios.hs:526-566) → the reference's
    * SCHEMA'D metadata JSON ({"int"|"string"|"bytes"|"list"|"map"} trees,
    * metadataToJson /root/reference/src/Kupo/Data/Cardano/Metadata.hs:73-97).
    * Null on malformed input. */
  def metadatumSchemaJson(wire: UTF8String): UTF8String = {
    import com.fasterxml.jackson.databind.JsonNode
    if (wire == null) return null
    try {
      def jstr(s: String): String = mapper.writeValueAsString(s)

      // metadatum tree rendered straight to the schema'd JSON text
      sealed trait M { def render: String }
      case class MI(n: BigInt) extends M { def render = s"""{"int":$n}""" }
      case class MS(s: String) extends M { def render = s"""{"string":${jstr(s)}}""" }
      case class MB(hex: String) extends M { def render = s"""{"bytes":"$hex"}""" }
      case class ML(xs: Seq[M]) extends M {
        def render = xs.map(_.render).mkString("""{"list":[""", ",", "]}")
      }
      case class MM(kvs: Seq[(M, M)]) extends M {
        def render = kvs.map { case (k, v) => s"""{"k":${k.render},"v":${v.render}}""" }
          .mkString("""{"map":[""", ",", "]}")
      }

      // the Ogmios "json" form: objects → maps with string keys, arrays →
      // lists, numbers → ints, strings → strings (valueToMetadatum,
      // Ogmios.hs:552-566)
      def fromJsonValue(n: JsonNode): M =
        if (n.isObject) {
          val it = n.fields()
          val buf = Seq.newBuilder[(M, M)]
          while (it.hasNext) { val e = it.next(); buf += ((MS(e.getKey), fromJsonValue(e.getValue))) }
          MM(buf.result())
        } else if (n.isArray) {
          val it = n.elements(); val buf = Seq.newBuilder[M]
          while (it.hasNext) buf += fromJsonValue(it.next())
          ML(buf.result())
        } else if (n.isNumber) MI(BigInt(n.bigIntegerValue()))
        else if (n.isTextual) MS(n.asText())
        else sys.error("unexpected bool/null in metadatum")

      // the "cbor" form: CBOR metadatum (uint/nint/bytes/text/array/map).
      // Integer ARGUMENTS are unsigned up to 64 bits (Cardano metadata
      // permits full-range uint64), so values decode as unsigned BigInt;
      // lengths must additionally fit an Int.
      def fromCbor(b: Array[Byte]): M = {
        var pos = 0
        def take(n: Int): Array[Byte] = { val r = b.slice(pos, pos + n); require(r.length == n); pos += n; r }
        def arg(info: Int): BigInt = info match {
          case i if i < 24 => BigInt(i)
          case 24 => BigInt(1, take(1))
          case 25 => BigInt(1, take(2))
          case 26 => BigInt(1, take(4))
          case 27 => BigInt(1, take(8))
          case _  => sys.error("indefinite/invalid length")
        }
        def len(info: Int): Int = { val n = arg(info); require(n.isValidInt); n.toInt }
        def item(): M = {
          val h = take(1).head & 0xff
          val (major, info) = (h >>> 5, h & 0x1f)
          major match {
            case 0 => MI(arg(info))
            case 1 => MI(BigInt(-1) - arg(info))
            case 2 => MB(Hex.encode(take(len(info))))
            case 3 => MS(new String(take(len(info)), java.nio.charset.StandardCharsets.UTF_8))
            case 4 => ML((0 until len(info)).map(_ => item()))
            case 5 => MM((0 until len(info)).map(_ => (item(), item())))
            case _ => sys.error(s"unsupported major type $major in metadatum")
          }
        }
        val r = item(); require(pos == b.length, "trailing bytes"); r
      }

      val root = mapper.readTree(wire.toString)
      val m =
        if (root.has("cbor"))
          fromCbor(Hex.decode(root.get("cbor").asText()).getOrElse(sys.error("bad hex")))
        else fromJsonValue(root.get("json"))
      UTF8String.fromString(m.render)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** One Hydra server-output line → one Ogmios nextBlock line (S3 bridge,
    * graft.ingest.HydraReader); "" for recognized non-block messages, null
    * for MALFORMED ones (the strict reader raises on null). */
  def hydraToOgmios(line: UTF8String): UTF8String = {
    if (line == null) return null
    val out = graft.ingest.HydraReader.messageToOgmios(line.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  /** One ledger block CBOR hex line → one Ogmios nextBlock line (S1 data
    * plane, graft.ingest.BlockCbor); null on unrecognizable bytes. */
  def blockCborToOgmios(line: UTF8String): UTF8String = {
    if (line == null) return null
    val out = graft.ingest.BlockCbor.blockToOgmios(line.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}

/** Both expressions are string→string, null-intolerant on input, and may
  * yield null on malformed input (like the reference's decoder failures). */
abstract class KernelExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  /** Java call over the child code; must assign to a UTF8String variable. */
  protected def kernelCall(childCode: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = ${kernelCall(c)};
      ${ev.isNull} = ${ev.value} == null;
    """)
}

/** kupo_address(wireText) — normalize a wire address to kupo hex. */
case class NormalizeAddress(child: Expression) extends KernelExpression {
  override def nullSafeEval(input: Any): Any =
    Kernels.normalizeAddress(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.normalizeAddress($c)"
  override protected def withNewChildInternal(newChild: Expression): NormalizeAddress =
    copy(child = newChild)
  override def prettyName: String = "kupo_address"
}

/** metadatum_schema(wireJson) — schema'd metadata JSON from a wire
  * metadatum ({"cbor": hex} | {"json": value}). */
case class MetadatumSchema(child: Expression) extends KernelExpression {
  override def nullSafeEval(input: Any): Any =
    Kernels.metadatumSchemaJson(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.metadatumSchemaJson($c)"
  override protected def withNewChildInternal(newChild: Expression): MetadatumSchema =
    copy(child = newChild)
  override def prettyName: String = "metadatum_schema"
}

/** native_script_cbor(clauseJson) — Timelock CBOR ("00"-tagged hex) of a
  * native-script clause tree. */
case class NativeScriptCbor(child: Expression) extends KernelExpression {
  override def nullSafeEval(input: Any): Any =
    Kernels.nativeScriptCbor(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.nativeScriptCbor($c)"
  override protected def withNewChildInternal(newChild: Expression): NativeScriptCbor =
    copy(child = newChild)
  override def prettyName: String = "native_script_cbor"
}

/** blake2b_hex(hexPayload, outLen) — blake2b-{224,256} over hex, hex out. */
case class Blake2bHex(child: Expression, outLen: Int) extends KernelExpression {
  require(outLen > 0 && outLen <= 64)
  override def nullSafeEval(input: Any): Any =
    Kernels.blake2bHex(input.asInstanceOf[UTF8String], outLen)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.blake2bHex($c, $outLen)"
  override protected def withNewChildInternal(newChild: Expression): Blake2bHex =
    copy(child = newChild)
  override def prettyName: String = s"blake2b${outLen * 8}_hex"
}

/** hydra_to_ogmios(serverOutputLine) — S3: one Hydra server-output message
  * rendered as an Ogmios nextBlock line (null when the message carries no
  * block), so the Hydra producer reuses the whole Ogmios ingest pipeline. */
case class HydraToOgmios(child: Expression) extends KernelExpression {
  override def nullSafeEval(input: Any): Any =
    Kernels.hydraToOgmios(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.hydraToOgmios($c)"
  override protected def withNewChildInternal(newChild: Expression): HydraToOgmios =
    copy(child = newChild)
  override def prettyName: String = "hydra_to_ogmios"
}

/** block_cbor_to_ogmios(blockHex) — S1 data plane: a whole ledger block
  * CBOR rendered as an Ogmios nextBlock line (null on unrecognizable
  * bytes), so pre-exported node blocks reuse the Ogmios ingest pipeline. */
case class BlockCborToOgmios(child: Expression) extends KernelExpression {
  override def nullSafeEval(input: Any): Any =
    Kernels.blockCborToOgmios(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.blockCborToOgmios($c)"
  override protected def withNewChildInternal(newChild: Expression): BlockCborToOgmios =
    copy(child = newChild)
  override def prettyName: String = "block_cbor_to_ogmios"
}
