package graft.ingest

import graft.Schemas
import graft.model.Pattern
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-batch decomposition of a block DataFrame into the index tables —
  * the flatMap-aggregate kernel `matchBlock`
  * (/root/reference/src/Kupo/Data/Pattern.hs:561-641; SURVEY.md §2.4 M1-M9),
  * re-expressed as declarative explodes + a disjunctive pattern predicate.
  * Each produced DataFrame is a narrow chain of posexplode/filter/project —
  * no shuffle anywhere in the kernel; Catalyst fuses it into one
  * WholeStageCodegen span per output. */
final case class Match(
    produced: DataFrame,    // new index rows (spent_* = null)
    spends: DataFrame,      // consumed refs with provenance (U1 feed)
    checkpoints: DataFrame,
    policies: DataFrame,
    datums: DataFrame,
    scripts: DataFrame
)

object MatchBlock {

  /** blocks: DataFrame with Schemas.blockType. Output indexes are the position
    * in the outputs array (ingestion is assumed normalized for Alonzo+ invalid
    * transactions — collateral handling is an extract-time concern,
    * /root/reference/src/Kupo/Data/Cardano.hs:293-323). */
  def apply(blocks: DataFrame, patterns: Set[Pattern]): Match = {
    // M1: block → (transaction_index, tx)
    val txs = blocks.select(
      col("slot_no"), col("header_hash"),
      posexplode(col("txs")).as(Seq("transaction_index", "tx")))

    // M2: tx → (output_index, output)
    val outputs = txs.select(
      col("slot_no"), col("transaction_index"),
      col("tx.id").as("tx_id"),
      col("tx.metadata_labels").as("metadata_labels"),
      posexplode(col("tx.outputs")).as(Seq("output_index", "out")))

    // M3+M4: disjunctive pattern filter, then project to the inputs row shape.
    // Address-null outputs are positional padding from invalid-transaction
    // normalization (BlockReader: collateral return at index |outputs|,
    // phantom positions padded with an all-null-fields struct — real
    // outputs always carry an address).
    val produced = outputs
      .where(col("out").isNotNull && col("out.address").isNotNull)
      .withColumn("address", col("out.address"))
      .withColumn("value", col("out.value"))
      .where(Pattern.anyOf(patterns))
      .select(
        col("tx_id"),
        col("output_index"),
        col("transaction_index"),
        col("address"),
        when(!col("address").startsWith("00"),
          substring(col("address"), -56, 56)).as("payment_credential"),
        col("value"),
        when(col("out.datum").isNotNull,
          struct(col("out.datum.flag").as("flag"), col("out.datum.hash").as("hash")))
          .as("datum_info"),
        col("out.script_hash").as("script_hash"),
        col("slot_no").as("created_at"),
        lit(null).cast("long").as("spent_at"),
        lit(null).cast(Schemas.spentByType).as("spent_by"),
        lit(null).cast("string").as("spent_with"),
        (col("slot_no") / Schemas.BucketSize).cast("long").as("created_bucket"))

    // M6: consumed refs with spending provenance + redeemer lookup
    val spends = txs.select(
        col("slot_no"), col("tx.id").as("spending_tx_id"),
        col("tx.redeemers").as("redeemers"),
        posexplode(col("tx.inputs")).as(Seq("input_index", "ref")))
      .select(
        col("ref.tx_id").as("tx_id"),
        col("ref.output_index").as("output_index"),
        col("slot_no").as("spent_at"),
        struct(col("spending_tx_id").as("tx_id"), col("input_index")).as("spent_by"),
        when(col("redeemers").isNotNull, col("redeemers").getItem(col("input_index")))
          .as("spent_with"))

    val checkpoints = blocks.select(col("slot_no"), col("header_hash"))

    // M5: one row per (output_reference, policy) carried in the value; the
    // creation slot rides along so policy queries can derive a slot window
    // (schema v4 — see Schemas.policiesType)
    val policies = policiesOf(produced)

    // M7: witnessed + inline datums/scripts
    val witnessedDatums = txs
      .where(col("tx.datums").isNotNull)
      .select(explode(col("tx.datums")).as(Seq("binary_data_hash", "binary_data")))
    val inlineDatums = outputs
      .where(col("out.datum.bytes").isNotNull)
      .select(col("out.datum.hash").as("binary_data_hash"),
              col("out.datum.bytes").as("binary_data"))
    val datums = witnessedDatums.unionByName(inlineDatums)
      .dropDuplicates("binary_data_hash")

    val witnessedScripts = txs
      .where(col("tx.scripts").isNotNull)
      .select(explode(col("tx.scripts")).as(Seq("script_hash", "script")))
    val inlineScripts = outputs
      .where(col("out.script_bytes").isNotNull)
      .select(col("out.script_hash").as("script_hash"),
              col("out.script_bytes").as("script"))
    val scripts = witnessedScripts.unionByName(inlineScripts)
      .dropDuplicates("script_hash")

    Match(produced, spends, checkpoints, policies, datums, scripts)
  }

  /** Per-batch (address → slot window) stats rows for the address_stats
    * side table (Schemas.addressStatsType) — one map-side-combined
    * aggregate over the batch's produced rows; payment_credential is
    * functionally dependent on the address, so first() is exact. */
  /** The M5 policy-rows derivation from a batch of produced inputs — shared
    * by the block matcher and by `GraftIndex.append("inputs", …)`, which
    * uses it to keep the policies side table a superset of live inputs no
    * matter who writes them. */
  def policiesOf(produced: DataFrame): DataFrame =
    produced.select(
        col("tx_id"), col("output_index"),
        explode(map_keys(col("value.assets"))).as("policy_id"),
        col("created_at"))
      .dropDuplicates("tx_id", "output_index", "policy_id")

  def addressStats(produced: DataFrame): DataFrame =
    produced.groupBy(col("address"))
      .agg(first(col("payment_credential"), ignoreNulls = true).as("payment_credential"),
        min(col("created_at")).as("min_slot"),
        max(col("created_at")).as("max_slot"))
}
