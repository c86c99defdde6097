package graft

import graft.expressions.{Blake2bHex, BlockCborToOgmios, HydraToOgmios, MetadatumSchema, NativeScriptCbor, NormalizeAddress}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Column-level API over the native kernel expressions, plus a
  * SparkSessionExtensions installer so SQL users get the same functions
  * (`spark.sql.extensions=graft.GraftExtensions`). */
object GraftFunctions {
  /** Normalize a wire address (bech32/base58/hex) to kupo hex form. */
  def kupoAddress(c: Column): Column =
    GraftShim.column(NormalizeAddress(GraftShim.expression(c)))

  /** blake2b-224 over a hex payload, hex out (credential/script hashing). */
  def blake2b224Hex(c: Column): Column =
    GraftShim.column(Blake2bHex(GraftShim.expression(c), 28))

  /** blake2b-256 over a hex payload, hex out (datum/txid hashing). */
  def blake2b256Hex(c: Column): Column =
    GraftShim.column(Blake2bHex(GraftShim.expression(c), 32))

  /** Native-script clause JSON → tag-prefixed Timelock CBOR hex. */
  def nativeScriptCbor(c: Column): Column =
    GraftShim.column(NativeScriptCbor(GraftShim.expression(c)))

  /** Wire metadatum ({"cbor"|"json"}) → the reference's schema'd JSON. */
  def metadatumSchema(c: Column): Column =
    GraftShim.column(MetadatumSchema(GraftShim.expression(c)))

  /** Hydra server-output line → Ogmios nextBlock line (S3 bridge). */
  def hydraToOgmios(c: Column): Column =
    GraftShim.column(HydraToOgmios(GraftShim.expression(c)))

  /** Ledger block CBOR hex → Ogmios nextBlock line (S1 data plane). */
  def blockCborToOgmios(c: Column): Column =
    GraftShim.column(BlockCborToOgmios(GraftShim.expression(c)))

  /** Register the functions on a session without the extensions mechanism. */
  def register(spark: SparkSession): Unit = {
    GraftShim.registerFunction(spark, "kupo_address",
      new ExpressionInfo(classOf[NormalizeAddress].getName, "kupo_address"),
      es => NormalizeAddress(es.head))
    GraftShim.registerFunction(spark, "blake2b224_hex",
      new ExpressionInfo(classOf[Blake2bHex].getName, "blake2b224_hex"),
      es => Blake2bHex(es.head, 28))
    GraftShim.registerFunction(spark, "blake2b256_hex",
      new ExpressionInfo(classOf[Blake2bHex].getName, "blake2b256_hex"),
      es => Blake2bHex(es.head, 32))
    GraftShim.registerFunction(spark, "native_script_cbor",
      new ExpressionInfo(classOf[NativeScriptCbor].getName, "native_script_cbor"),
      es => NativeScriptCbor(es.head))
    GraftShim.registerFunction(spark, "metadatum_schema",
      new ExpressionInfo(classOf[MetadatumSchema].getName, "metadatum_schema"),
      es => MetadatumSchema(es.head))
    GraftShim.registerFunction(spark, "hydra_to_ogmios",
      new ExpressionInfo(classOf[HydraToOgmios].getName, "hydra_to_ogmios"),
      es => HydraToOgmios(es.head))
    GraftShim.registerFunction(spark, "block_cbor_to_ogmios",
      new ExpressionInfo(classOf[BlockCborToOgmios].getName, "block_cbor_to_ogmios"),
      es => BlockCborToOgmios(es.head))
  }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` installs the kernel
  * functions into every session (SparkSessionExtensions injection point). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("kupo_address"),
      new ExpressionInfo(classOf[NormalizeAddress].getName, "kupo_address"),
      es => NormalizeAddress(es.head)))
    ext.injectFunction((FunctionIdentifier("blake2b224_hex"),
      new ExpressionInfo(classOf[Blake2bHex].getName, "blake2b224_hex"),
      es => Blake2bHex(es.head, 28)))
    ext.injectFunction((FunctionIdentifier("blake2b256_hex"),
      new ExpressionInfo(classOf[Blake2bHex].getName, "blake2b256_hex"),
      es => Blake2bHex(es.head, 32)))
    ext.injectFunction((FunctionIdentifier("native_script_cbor"),
      new ExpressionInfo(classOf[NativeScriptCbor].getName, "native_script_cbor"),
      es => NativeScriptCbor(es.head)))
    ext.injectFunction((FunctionIdentifier("metadatum_schema"),
      new ExpressionInfo(classOf[MetadatumSchema].getName, "metadatum_schema"),
      es => MetadatumSchema(es.head)))
    ext.injectFunction((FunctionIdentifier("hydra_to_ogmios"),
      new ExpressionInfo(classOf[HydraToOgmios].getName, "hydra_to_ogmios"),
      es => HydraToOgmios(es.head)))
    ext.injectFunction((FunctionIdentifier("block_cbor_to_ogmios"),
      new ExpressionInfo(classOf[BlockCborToOgmios].getName, "block_cbor_to_ogmios"),
      es => BlockCborToOgmios(es.head)))
  }
}
