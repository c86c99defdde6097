package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Read operators over the BLOCK source (not the index) — the analogues of
  * the on-demand fetch clients (SURVEY.md §2.1 S4/S5, §2.3 R11). The
  * reference keeps a live network client for these; a Spark deployment keeps
  * the normalized block table (BlockReader output) and answers them as
  * point-lookups/aggregates that prune to one slot partition. */
object BlockQueries {

  /** S4 FetchBlock (/root/reference/src/Kupo/Data/FetchBlock.hs; used by
    * /metadata, Http.hs:754-805): single-block point lookup. */
  def fetchBlock(blocks: DataFrame, slot: Long): DataFrame =
    blocks.where(col("slot_no") === slot).limit(1)

  /** S5 FetchTip (/root/reference/src/Kupo/App/FetchTip/{Node,Ogmios}.hs). */
  def fetchTip(blocks: DataFrame): Option[(Long, String)] =
    blocks.orderBy(col("slot_no").desc).limit(1)
      .select(col("slot_no"), col("header_hash"))
      .collect().headOption.map(r => (r.getLong(0), r.getString(1)))

  /** R11 GET /metadata/{slot}?transaction_id= (Http.hs:754-805): fold the
    * block's transactions, optionally filtered by txid, and emit
    * (transaction_id, label, payload, schema) per metadata entry — `schema`
    * is the reference's structured metadata JSON
    * ({"int"|"string"|"bytes"|"list"|"map"} trees, metadataToJson
    * /root/reference/src/Kupo/Data/Cardano/Metadata.hs:73-97), rendered by
    * the metadatum_schema kernel from the raw wire payload. */
  def metadataBySlot(blocks: DataFrame, slot: Long,
                     transactionId: Option[String] = None): DataFrame = {
    val txs = fetchBlock(blocks, slot)
      .select(posexplode(col("txs")).as(Seq("transaction_index", "tx")))
    val filtered = transactionId match {
      case Some(tid) => txs.where(col("tx.id") === tid)
      case None      => txs
    }
    filtered
      .where(col("tx.metadata").isNotNull)
      .select(col("tx.id").as("transaction_id"),
        explode(col("tx.metadata")).as(Seq("label", "payload")))
      .withColumn("schema", graft.GraftFunctions.metadatumSchema(col("payload")))
      .orderBy(col("transaction_id"), col("label"))
  }
}
