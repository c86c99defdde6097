package graft.ingest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.codec.{Blake2b, Hex}
import graft.index.GraftIndex
import graft.model.Pattern
import graft.streaming.StreamingIndexer
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** S3 — the Hydra producer (/root/reference/src/Kupo/App/ChainSync/Hydra.hs,
  * /root/reference/src/Kupo/Data/Hydra.hs) as a declarative rewriter: each
  * Hydra server-output line becomes an Ogmios `nextBlock` line, and the ONE
  * existing ingest pipeline (BlockReader → MatchBlock → GraftIndex) handles
  * the rest. Blocks are synthesized exactly like `mkHydraBlock`
  * (Hydra.hs:100-120): slot = snapshot number, header hash = blake2b-256
  * over the concatenated transaction ids.
  *
  *  - `SnapshotConfirmed` → block of the snapshot's confirmed transactions,
  *    each decoded from ledger CBOR (`TxCbor`, the analogue of Hydra.hs's
  *    `decodePartialTransaction` :178-221);
  *  - `HeadIsOpen` → genesis "block 0" whose transactions re-create the
  *    head's initial UTxO (decodeHeadIsOpen :140-176), grouped by
  *    transaction id ascending (the reference's Map ordering), with output
  *    positions preserved by null-padding sparse indices;
  *  - `TxValid` and every other message carry no block → dropped.
  * Hydra heads never roll back, so the stream is forwards-only. */
object HydraReader {

  private val mapper = new ObjectMapper()

  /** One Hydra server-output line → one Ogmios nextBlock line. Two distinct
    * non-block results, so callers can tell "benign" from "broken":
    *  - `""` — a recognized Hydra envelope carrying no block (TxValid etc.);
    *  - `null` — MALFORMED input: unparseable JSON, no tag, or a
    *    block-bearing message whose payload fails to decode. The reference
    *    fails loudly on these ([[toOgmiosLines]] raises in strict mode);
    *    silently skipping one would leave an undetectable gap in the chain. */
  def messageToOgmios(line: String): String = {
    val root = try mapper.readTree(line) catch { case NonFatal(_) => return null }
    val tag = Option(root).flatMap(r => Option(r.get("tag"))).map(_.asText()).orNull
    if (tag == null) return null
    try {
      tag match {
        case "SnapshotConfirmed" =>
          val snap = root.get("snapshot")
          val number = snap.get("number").asLong()
          val txs = snap.get("confirmed").elements().asScala.toVector.map { t =>
            // older heads ship the raw cbor text, newer ones a tx envelope
            val cborHex = if (t.isTextual) t.asText() else t.get("cborHex").asText()
            TxCbor.decodeTx(cborHex).getOrElse(sys.error("undecodable confirmed tx"))
          }
          ogmiosBlock(number, txs.map(_.idHex), txs.map(_.json))
        case "HeadIsOpen" =>
          val utxo = root.get("utxo")
          if (utxo == null || !utxo.isObject) null
          else {
            var grouped = scala.collection.immutable.SortedMap.empty[String, List[(Int, JsonNode)]]
            utxo.properties().asScala.foreach { e =>
              e.getKey.split("#", 2) match {
                case Array(txId, ixText) =>
                  grouped = grouped.updated(txId, (ixText.toInt, e.getValue) :: grouped.getOrElse(txId, Nil))
                case _ => sys.error(s"malformed utxo ref: ${e.getKey}")
              }
            }
            val txs = grouped.toVector.map { case (txId, outs) =>
              val byIx = outs.toMap
              val outJsons = (0 to outs.map(_._1).max)
                .map(i => byIx.get(i).map(genesisOutputJson).getOrElse("null"))
              txId ->
                s"""{"id":"$txId","spends":"inputs","inputs":[],"outputs":[${outJsons.mkString(",")}]}"""
            }
            ogmiosBlock(0L, txs.map(_._1), txs.map(_._2))
          }
        case _ => "" // recognized envelope, no block to ingest
      }
    } catch { case NonFatal(_) => null }
  }

  /** mkHydraBlock (Hydra.hs:100-120): header hash = blake2b-256 of the
    * concatenated tx id bytes, slot = height = snapshot number. */
  private def ogmiosBlock(number: Long, idsHex: Seq[String], txJsons: Seq[String]): String = {
    val idBytes = idsHex.toArray.flatMap(id =>
      Hex.decode(id).getOrElse(sys.error("bad tx id")))
    val hash = Hex.encode(Blake2b.hash256(idBytes))
    s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"forward",""" +
      s""""block":{"id":"$hash","slot":$number,"height":$number,""" +
      s""""transactions":[${txJsons.mkString(",")}]},""" +
      s""""tip":{"slot":$number,"id":"$hash"}}}"""
  }

  /** Hydra's genesis-UTxO output JSON (address text, FLAT value map with a
    * `lovelace` key — decodeValue Hydra.hs:324-352, datumHash/datum/script
    * fields — decodeOutput :246-253) → the Ogmios wire output shape. */
  private def genesisOutputJson(o: JsonNode): String = {
    val fields = Seq.newBuilder[String]
    fields += s""""address":${mapper.writeValueAsString(o.get("address").asText())}"""
    val v = o.get("value")
    val lovelace = Option(v).flatMap(n => Option(n.get("lovelace")))
      .map(n => BigInt(n.bigIntegerValue())).getOrElse(BigInt(0))
    val policies = Option(v).toSeq.flatMap(_.properties().asScala)
      .filterNot(_.getKey == "lovelace")
      .map { e =>
        val assets = e.getValue.properties().asScala
          .map(a => s""""${a.getKey}":${BigInt(a.getValue.bigIntegerValue())}""").mkString(",")
        s""""${e.getKey}":{$assets}"""
      }
    fields += s""""value":{"ada":{"lovelace":$lovelace}${
      if (policies.nonEmpty) "," + policies.mkString(",") else ""}}"""
    Option(o.get("datumHash")).filter(!_.isNull)
      .foreach(h => fields += s""""datumHash":"${h.asText()}"""")
    Option(o.get("datum")).filter(!_.isNull)
      .foreach(d => fields += s""""datum":"${d.asText()}"""")
    Option(o.get("script")).filter(!_.isNull).foreach { s =>
      val wrapped = Hex.decode(s.asText()).getOrElse(sys.error("bad script hex"))
      fields += s""""script":${TxCbor.scriptJsonFromWrapped(wrapped)}"""
    }
    fields.result().mkString("{", ",", "}")
  }

  /** Declarative bridge: raw Hydra lines → raw Ogmios lines (codegen'd
    * kernel; recognized non-block messages drop out). In strict mode
    * (default) a MALFORMED line fails the job at that exact row via
    * `raise_error`, carrying a prefix of the offending line — a decoder bug
    * or new message shape can never silently gap the chain (the reference
    * fails loudly on undecodable input too). `strict = false` restores
    * drop-malformed for exploratory reads. */
  def toOgmiosLines(raw: DataFrame, strict: Boolean = true): DataFrame =
    raw.select(ogmiosCol(strict)(col("raw")).as("raw"))
      .where(col("raw").isNotNull && length(col("raw")) > 0)

  /** The per-LINE bridge as a column transform — the form
    * `StreamingIndexer.processBatch(rewrite = …)` threads through its
    * ordered re-read (a pre-transformed frame would re-read the original
    * non-Ogmios lines on a reorg batch). */
  def ogmiosCol(strict: Boolean)(raw: Column): Column = {
    val decoded = graft.GraftFunctions.hydraToOgmios(raw)
    if (strict)
      when(decoded.isNull, raise_error(
        concat(lit("undecodable Hydra line: "), substring(raw, 1, 96))))
        .otherwise(decoded)
    else decoded
  }

  /** Batch entry: Hydra JSONL file(s) → normalized blocks. */
  def readJsonl(spark: SparkSession, path: String): DataFrame = {
    val og = toOgmiosLines(spark.read.text(path).withColumnRenamed("value", "raw"))
    BlockReader.blocks(BlockReader.parseEnvelope(og))
  }

  /** Streaming entry: tail a directory of Hydra JSONL; the drain reuses
    * StreamingIndexer.processBatch (forwards-only, so the rollback
    * machinery never engages). */
  def start(spark: SparkSession, inputDir: String, ix: GraftIndex,
            patterns: Set[Pattern],
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .text(inputDir)
      .withColumnRenamed("value", "raw")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        StreamingIndexer.processBatch(ix, batch, patterns,
          rewrite = ogmiosCol(strict = true))
      }
      .option("checkpointLocation", s"${ix.root}/_stream_checkpoint")
      .trigger(trigger)
      .start()
}
