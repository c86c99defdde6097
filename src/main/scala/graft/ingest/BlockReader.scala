package graft.ingest

import graft.codec.Hex

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2 — the Ogmios producer re-expressed as a declarative JSON reader.
  *
  * The reference speaks the Ogmios `nextBlock` websocket protocol and decodes
  * each response into a PartialBlock (/root/reference/src/Kupo/Data/Ogmios.hs:
  * decodeNextBlockResponse :176-193, decodeBlock :195-204,
  * decodePartialTransaction :206-247, decodeOutput :280-298); the wire shape
  * is fixed by the golden vector /root/reference/test/vectors/golden/1.json.
  * Here the same JSON lines (one response per line) are parsed with a FIXED
  * StructType via `from_json` — no schema inference, one codegen'd pass —
  * then normalized into the engine's block schema (Schemas.blockType).
  *
  * Normalizations applied at ingest (SURVEY.md §7.2 — decode once so the
  * query layer needs zero exotic functions):
  *  - addresses: bech32/base58/hex wire text → kupo hex form (UDF over the
  *    pure-Scala codecs; ingest-time only, never in the query path);
  *  - value: `{ada: {lovelace: n}, policy: {asset: q}}` map → struct(coins,
  *    assets) with the ada entry split out;
  *  - inline datums are hashed (blake2b-256) and inline scripts tagged +
  *    hashed (blake2b-224) exactly like the reference
  *    (Ogmios.hs decodeOutput :288-295, decodeScript :320-337);
  *  - invalid transactions (`spends: "collaterals"`): inputs come from the
  *    collaterals list and the ONLY produced output is the collateral return
  *    at index |outputs| (Ogmios.hs :229-236; Cardano.hs:293-323). The
  *    reader keeps positional indexing by padding with |outputs| nulls —
  *    MatchBlock drops null outputs.
  *
  * Native (JSON-clause) scripts are CBOR re-serialized (Timelock layout,
  * pinned by the native rows of /root/reference/test/vectors/scripts.csv)
  * and hashed like the reference (Ogmios.hs:320-365) — witnessed AND inline.
  */
object BlockReader {

  private val wireInput = StructType(Seq(
    StructField("transaction", StructType(Seq(StructField("id", StringType))), nullable = true),
    StructField("index", IntegerType, nullable = true)))

  private val wireScript = StructType(Seq(
    StructField("language", StringType, nullable = true),
    StructField("cbor", StringType, nullable = true),
    // native scripts ship a clause TREE; declaring the field StringType makes
    // Spark's JSON parser capture the raw subtree text, which the
    // native_script_cbor kernel then serializes to Timelock CBOR
    StructField("json", StringType, nullable = true)))

  private val wireOutput = StructType(Seq(
    StructField("address", StringType, nullable = true),
    StructField("value",
      MapType(StringType, MapType(StringType, DecimalType(38, 0))), nullable = true),
    StructField("datumHash", StringType, nullable = true),
    StructField("datum", StringType, nullable = true),
    StructField("script", wireScript, nullable = true)))

  private val wireTx = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("spends", StringType, nullable = true),
    StructField("inputs", ArrayType(wireInput), nullable = true),
    StructField("collaterals", ArrayType(wireInput), nullable = true),
    StructField("outputs", ArrayType(wireOutput), nullable = true),
    StructField("collateralReturn", wireOutput, nullable = true),
    StructField("datums", MapType(StringType, StringType), nullable = true),
    StructField("scripts", MapType(StringType, wireScript), nullable = true),
    StructField("redeemers", ArrayType(StructType(Seq(
      StructField("validator", StructType(Seq(
        StructField("purpose", StringType, nullable = true),
        StructField("index", IntegerType, nullable = true))), nullable = true),
      StructField("redeemer", StringType, nullable = true)))), nullable = true),
    StructField("metadata", StructType(Seq(
      StructField("hash", StringType, nullable = true),
      StructField("labels", MapType(StringType, StringType), nullable = true))),
      nullable = true)))

  /** Fixed wire schema of one `nextBlock` response line. */
  val ogmiosSchema: StructType = StructType(Seq(
    StructField("method", StringType, nullable = true),
    StructField("result", StructType(Seq(
      StructField("direction", StringType, nullable = true),
      StructField("block", StructType(Seq(
        StructField("id", StringType, nullable = true),
        StructField("slot", LongType, nullable = true),
        StructField("height", LongType, nullable = true),
        StructField("transactions", ArrayType(wireTx), nullable = true)
      )), nullable = true),
      // "backward" carries result.point = {slot, id} | the string "origin"
      // (a string parses to null here — null point ⇒ origin)
      StructField("point", StructType(Seq(
        StructField("slot", LongType, nullable = true),
        StructField("id", StringType, nullable = true))), nullable = true)
    )), nullable = true)))

  /** Wire address text (bech32 `addr…`, base58 Byron, or raw hex) → kupo
    * hex, mirroring decodeAddress via patternFromText (Ogmios.hs:349-358);
    * inline datum/script hashing likewise. These are native Catalyst
    * expressions (graft.expressions) rather than UDFs: the normalization
    * runs on EVERY produced output, and keeping it inside WholeStageCodegen
    * removes the UDF serialization/boxing fence from the 100 TB ingest
    * path. */
  private def toKupoAddress(c: Column): Column = graft.GraftFunctions.kupoAddress(c)
  private def blake256Hex(c: Column): Column = graft.GraftFunctions.blake2b256Hex(c)
  private def blake224Hex(c: Column): Column = graft.GraftFunctions.blake2b224Hex(c)

  /** Parse raw JSON lines (one column `raw`) into the typed envelope;
    * `keep` columns (e.g. a chain-sequence number) ride along. */
  def parseEnvelope(raw: DataFrame, keep: Seq[String] = Nil): DataFrame =
    raw.select(keep.map(col) :+ from_json(col("raw"), ogmiosSchema).as("env"): _*)
      .where(col("env.method") === "nextBlock")
      .select(keep.map(col) ++ Seq(
        col("env.result.direction").as("direction"),
        col("env.result.block").as("block"),
        col("env.result.point").as("point")): _*)

  /** language tag byte of a plutus script (Ogmios.hs:325-330). */
  private def scriptTag(language: Column): Column =
    when(language === "plutus:v1", "01")
      .when(language === "plutus:v2", "02")
      .when(language === "plutus:v3", "03")

  /** Tag-prefixed script bytes (scriptToBytes layout): plutus = tag ‖ wire
    * cbor; native = "00" ‖ Timelock CBOR serialized from the clause tree
    * (Ogmios.hs:320-365 — the reference hashes native scripts too; this
    * removes the round-1 "inline native scripts are dropped" limitation). */
  private def scriptBytesCol(s: Column): Column =
    when(s.getField("language") === "native",
      graft.GraftFunctions.nativeScriptCbor(s.getField("json")))
      .otherwise(when(scriptTag(s.getField("language")).isNotNull,
        concat(scriptTag(s.getField("language")), s.getField("cbor"))))

  private def normalizedOutput(out: Column): Column = {
    val bytes = scriptBytesCol(out.getField("script"))
    struct(
      toKupoAddress(out.getField("address")).as("address"),
      struct(
        coalesce(out.getField("value").getItem("ada").getItem("lovelace"),
          lit(0).cast(DecimalType(38, 0))).as("coins"),
        map_filter(out.getField("value"), (k, _) => k =!= "ada").as("assets")).as("value"),
      when(out.getField("datumHash").isNotNull,
        struct(lit(0).cast("byte").as("flag"), out.getField("datumHash").as("hash"),
          lit(null).cast("string").as("bytes")))
        .when(out.getField("datum").isNotNull,
          struct(lit(1).cast("byte").as("flag"), blake256Hex(out.getField("datum")).as("hash"),
            out.getField("datum").as("bytes"))).as("datum"),
      when(out.getField("script").isNotNull && bytes.isNotNull,
        blake224Hex(bytes)).as("script_hash"),
      when(out.getField("script").isNotNull, bytes).as("script_bytes"))
  }

  /** Roll-forward envelopes → Schemas.blockType. Invalid transactions
    * (`spends: "collaterals"`) take inputs from the collaterals list and
    * produce ONLY the collateral return at index |outputs|
    * (Ogmios.hs:229-236; Cardano.hs:293-323) — the reader pads |outputs|
    * nulls so positional indexing stays exact; MatchBlock drops nulls. */
  def blocks(envelope: DataFrame): DataFrame = {
    val fwd = envelope.where(col("direction") === "forward")
    fwd.select(
      coalesce(col("block.slot"), col("block.height")).as("slot_no"),
      col("block.id").as("header_hash"),
      transform(coalesce(col("block.transactions"), array().cast(ArrayType(wireTx))), t => {
        struct(
          t.getField("id").as("id"),
          transform(
            when(t.getField("spends") === "collaterals",
              coalesce(t.getField("collaterals"), array().cast(ArrayType(wireInput))))
              .otherwise(coalesce(t.getField("inputs"), array().cast(ArrayType(wireInput)))),
            in => struct(
              in.getField("transaction").getField("id").as("tx_id"),
              in.getField("index").as("output_index"))).as("inputs"),
          transform(
            when(t.getField("spends") === "collaterals",
              concat(
                transform(coalesce(t.getField("outputs"), array().cast(ArrayType(wireOutput))),
                  _ => lit(null).cast(wireOutput)),
                when(t.getField("collateralReturn").isNotNull,
                  array(t.getField("collateralReturn")))
                  .otherwise(array().cast(ArrayType(wireOutput)))))
              .otherwise(coalesce(t.getField("outputs"), array().cast(ArrayType(wireOutput)))),
            out => when(out.isNotNull, normalizedOutput(out))).as("outputs"),
          t.getField("datums").as("datums"),
          when(t.getField("scripts").isNotNull,
            map_filter(
              transform_values(t.getField("scripts"), (_, s) => scriptBytesCol(s)),
              (_, v) => v.isNotNull)).as("scripts"),
          when(t.getField("redeemers").isNotNull,
            map_from_entries(
              transform(
                filter(t.getField("redeemers"),
                  r => r.getField("validator").getField("purpose") === "spend"),
                r => struct(r.getField("validator").getField("index"),
                  r.getField("redeemer"))))).as("redeemers"),
          when(t.getField("metadata").isNotNull,
            transform(map_keys(t.getField("metadata").getField("labels")),
              k => k.cast("long"))).as("metadata_labels"),
          when(t.getField("metadata").isNotNull,
            t.getField("metadata").getField("labels")).as("metadata"))
      }).as("txs"))
  }

  /** Roll-backward envelopes → rollback points (null point ⇒ origin/-1). */
  def rollbacks(envelope: DataFrame): DataFrame =
    envelope.where(col("direction") === "backward")
      .select(coalesce(col("point.slot"), lit(-1L)).as("slot_no"),
        col("point.id").as("header_hash"))

  /** Batch entry: JSONL file(s) of nextBlock responses → (blocks, rollbacks). */
  def readJsonl(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val env = parseEnvelope(spark.read.text(path).withColumnRenamed("value", "raw"))
    (blocks(env), rollbacks(env))
  }
}
