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
      if (bytes.length > 1 && (bytes(0) & 0xff) >= 0x80) Some("00" + Hex.encode(bytes))
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
