package graft.tools

import graft.codec.Hex
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.Schemas

/** Deterministic kupo-shaped block fixtures (FIXTURES.md A.1), in the spirit
  * of the reference's generators (/root/reference/test/Test/Kupo/Data/Generators.hs)
  * and UtxoConstraint (spent refs always reference previously-produced outputs). */
object FixtureChain {
  import java.math.{BigDecimal => JBD}

  final case class Out(address: String, coins: Long,
                       assets: Map[String, Map[String, Long]] = Map.empty,
                       datumFlag: Option[Byte] = None, datumHash: Option[String] = None,
                       datumBytes: Option[String] = None,
                       scriptHash: Option[String] = None, scriptBytes: Option[String] = None)
  final case class Tx(id: String, inputs: Seq[(String, Int)], outputs: Seq[Out],
                      datums: Map[String, String] = Map.empty,
                      scripts: Map[String, String] = Map.empty,
                      redeemers: Map[Int, String] = Map.empty,
                      metadataLabels: Seq[Long] = Nil,
                      metadata: Map[String, String] = Map.empty)
  final case class Blk(slot: Long, headerHash: String, txs: Seq[Tx])

  def hex32(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    val b = new Array[Byte](32); rnd.nextBytes(b); Hex.encode(b)
  }
  def hex28(seed: Int): String = {
    val rnd = new scala.util.Random(seed + 7777)
    val b = new Array[Byte](28); rnd.nextBytes(b); Hex.encode(b)
  }

  /** A base (tag-1) kupo address from two credential seeds. */
  def baseAddr(paySeed: Int, delSeed: Int): String =
    "01" + hex28(1000 + delSeed) + "01" + hex28(2000 + paySeed)
  /** An enterprise (tag-3) kupo address. */
  def enterpriseAddr(paySeed: Int): String = "03" + "61" + hex28(2000 + paySeed)
  /** A bootstrap (tag-0) kupo address. */
  def bootstrapAddr(seed: Int): String = "00" + "82d818" + hex28(3000 + seed)

  /** A deterministic chain: `nBlocks` blocks at slots 10,20,…; each block has
    * 2 txs × 2 outputs over a rotating set of addresses; every tx after the
    * first spends one previously-produced output. */
  def chain(nBlocks: Int): Seq[Blk] = {
    // pool of not-yet-spent refs: each ref is spent at most once (valid chain)
    val available = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    (0 until nBlocks).map { b =>
      val slot = 10L * (b + 1)
      val txs = (0 until 2).map { t =>
        val txId = hex32(b * 100 + t)
        val spend =
          if (available.size > 2) Seq(available.remove((b * 31 + t * 17) % (available.size - 2)))
          else Seq.empty
        val outs = (0 until 2).map { o =>
          val idx = (b + t + o) % 4
          val addr = idx match {
            case 0 => baseAddr(0, 0)
            case 1 => baseAddr(1, 0)
            case 2 => enterpriseAddr(1)
            case 3 => if (b % 3 == 0) bootstrapAddr(0) else baseAddr(2, 1)
          }
          val assets =
            if ((b + o) % 3 == 0) Map(hex28(50) -> Map("abcd" -> (100L + b), "beef" -> 7L))
            else if ((b + o) % 3 == 1) Map(hex28(51) -> Map("cafe" -> 1L))
            else Map.empty[String, Map[String, Long]]
          val withDatum = (b + t + o) % 4 == 0
          Out(addr, 1000L * (b + 1) + 10 * t + o, assets,
            datumFlag = if (withDatum) Some(if (o % 2 == 0) 1.toByte else 0.toByte) else None,
            datumHash = if (withDatum) Some(hex32(9000 + b * 10 + t * 2 + o)) else None,
            datumBytes = if (withDatum && o % 2 == 0) Some("d87980" + f"$b%02x") else None)
        }
        outs.zipWithIndex.foreach { case (_, o) => available += ((txId, o)) }
        Tx(txId, spend, outs,
          redeemers = if (spend.nonEmpty && t == 1) Map(0 -> ("4d01" + f"$b%02x")) else Map.empty,
          metadataLabels = if (b % 2 == 0) Seq(674L, 721L) else Nil,
          metadata = if (b % 2 == 0)
            // wire metadatum form (Ogmios.hs:543-551): json tree or cbor hex
            Map("674" -> s"""{"json":{"msg":["block $b"]}}""",
                "721" -> """{"cbor":"a11902d1a0"}""")
          else Map.empty)
      }
      Blk(slot, hex32(500000 + b), txs)
    }
  }

  def toDf(spark: SparkSession, blocks: Seq[Blk]): DataFrame = {
    val rows = blocks.map { blk =>
      Row(blk.slot, blk.headerHash, blk.txs.map { tx =>
        Row(
          tx.id,
          tx.inputs.map { case (t, i) => Row(t, i) },
          tx.outputs.map { o =>
            Row(
              o.address,
              Row(new JBD(o.coins), o.assets.map { case (p, as) =>
                p -> as.map { case (a, q) => a -> new JBD(q) }
              }),
              o.datumFlag.map(f => Row(f, o.datumHash.get, o.datumBytes.orNull)).orNull,
              o.scriptHash.orNull,
              o.scriptBytes.orNull)
          },
          if (tx.datums.isEmpty) null else tx.datums,
          if (tx.scripts.isEmpty) null else tx.scripts,
          if (tx.redeemers.isEmpty) null else tx.redeemers,
          if (tx.metadataLabels.isEmpty) null else tx.metadataLabels,
          if (tx.metadata.isEmpty) null else tx.metadata)
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2).asInstanceOf[org.apache.spark.rdd.RDD[Row]],
      Schemas.blockType)
  }
}
