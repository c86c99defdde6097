package graft

import org.apache.spark.sql.types._

/** Fixed StructTypes for every table — no schema inference anywhere
  * (the reference's schema is fixed + versioned: db/v2.1.0/003.sql et al;
  * SURVEY.md §1.2/§1.4). Hashes and ids are lowercase-hex STRINGs: pattern
  * semantics are string-prefix predicates over the kupo address form, and hex
  * strings dictionary-encode well in parquet; `value` is a struct+map instead
  * of the reference's opaque CBOR blob so Catalyst can predicate-push into it. */
object Schemas {

  /** Asset bundle: policy hex → (asset-name hex → quantity). Quantities are
    * Decimal(38,0) — covers the reference's unbounded Integer in practice
    * (/root/reference/src/Kupo/Data/Cardano/Value.hs:30-47; SURVEY.md §1.4). */
  val valueType: StructType = StructType(Seq(
    StructField("coins", DecimalType(38, 0), nullable = false),
    StructField("assets",
      MapType(StringType, MapType(StringType, DecimalType(38, 0), valueContainsNull = false)),
      nullable = true)
  ))

  /** flag: 0 = reference datum, 1 = inline datum
    * (/root/reference/src/Kupo/Data/Database.hs:316-399). */
  val datumInfoType: StructType = StructType(Seq(
    StructField("flag", ByteType, nullable = false),
    StructField("hash", StringType, nullable = false)
  ))

  val outputReferenceType: StructType = StructType(Seq(
    StructField("tx_id", StringType, nullable = false),
    StructField("output_index", IntegerType, nullable = false)
  ))

  val spentByType: StructType = StructType(Seq(
    StructField("tx_id", StringType, nullable = false),
    StructField("input_index", IntegerType, nullable = false)
  ))

  /** Ingestion shape — Dataset[PartialBlock]
    * (/root/reference/src/Kupo/Data/PartialBlock.hs:35-49; FIXTURES.md A.1). */
  val blockType: StructType = StructType(Seq(
    StructField("slot_no", LongType, nullable = false),
    StructField("header_hash", StringType, nullable = false),
    StructField("txs", ArrayType(StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("inputs", ArrayType(outputReferenceType), nullable = false),
      StructField("outputs", ArrayType(StructType(Seq(
        StructField("address", StringType, nullable = false),
        StructField("value", valueType, nullable = false),
        StructField("datum", StructType(Seq(
          StructField("flag", ByteType, nullable = false),
          StructField("hash", StringType, nullable = false),
          StructField("bytes", StringType, nullable = true)
        )), nullable = true),
        StructField("script_hash", StringType, nullable = true),
        StructField("script_bytes", StringType, nullable = true)
      ))), nullable = false),
      StructField("datums", MapType(StringType, StringType), nullable = true),
      StructField("scripts", MapType(StringType, StringType), nullable = true),
      StructField("redeemers", MapType(IntegerType, StringType), nullable = true),
      StructField("metadata_labels", ArrayType(LongType), nullable = true),
      // label → raw payload (JSON/CBOR-hex as delivered by the wire); kept
      // for R11 GET /metadata/{slot} (SURVEY.md §2.3), never indexed
      StructField("metadata", MapType(StringType, StringType), nullable = true)
    ))), nullable = false)
  ))

  /** The fact table (db/v2.1.0/003.sql + v2.10.0/001.sql → SURVEY.md §1.2).
    * `created_bucket` = created_at / BucketSize is the physical partition key:
    * slot-range scans partition-prune and rollbacks become partition drops. */
  val inputsType: StructType = StructType(Seq(
    StructField("tx_id", StringType, nullable = false),
    StructField("output_index", IntegerType, nullable = false),
    StructField("transaction_index", IntegerType, nullable = false),
    StructField("address", StringType, nullable = false),
    StructField("payment_credential", StringType, nullable = true),
    StructField("value", valueType, nullable = false),
    StructField("datum_info", datumInfoType, nullable = true),
    StructField("script_hash", StringType, nullable = true),
    StructField("created_at", LongType, nullable = false),
    StructField("spent_at", LongType, nullable = true),
    StructField("spent_by", spentByType, nullable = true),
    StructField("spent_with", StringType, nullable = true),
    StructField("created_bucket", LongType, nullable = false)
  ))

  /** Spend-marking delta (merge-on-read side of U1 markInputs). */
  val spendsType: StructType = StructType(Seq(
    StructField("tx_id", StringType, nullable = false),
    StructField("output_index", IntegerType, nullable = false),
    StructField("spent_at", LongType, nullable = false),
    StructField("spent_by", spentByType, nullable = false),
    StructField("spent_with", StringType, nullable = true)
  ))

  val checkpointsType: StructType = StructType(Seq(
    StructField("slot_no", LongType, nullable = false),
    StructField("header_hash", StringType, nullable = false)
  ))

  val binaryDataType: StructType = StructType(Seq(
    StructField("binary_data_hash", StringType, nullable = false),
    StructField("binary_data", StringType, nullable = false)
  ))

  val scriptsType: StructType = StructType(Seq(
    StructField("script_hash", StringType, nullable = false),
    StructField("script", StringType, nullable = false)
  ))

  val patternsType: StructType = StructType(Seq(
    StructField("pattern", StringType, nullable = false)
  ))

  /** Denormalized (output, policy) side index (db/v2.1.0/002.sql:10-20),
    * plus the creation slot (schema v4): the reference's policiesByPolicyId
    * B-tree answers "which outputs carry policy P" directly; the Spark
    * analogue answers "which SLOT WINDOW carries policy P" from this table
    * (a bloom-served two-long aggregate) and then prunes `inputs` segments
    * with it — the slot column is what makes the side table composable
    * with the slot-clustered fact layout. INVARIANT: this table is a
    * superset of the asset-carrying live inputs (every ingest/backfill
    * writes it; mutations may leave stale rows, which only WIDEN the
    * window — never a missing row, which would wrongly prune). */
  val policiesType: StructType = StructType(Seq(
    StructField("tx_id", StringType, nullable = false),
    StructField("output_index", IntegerType, nullable = false),
    StructField("policy_id", StringType, nullable = false),
    StructField("created_at", LongType, nullable = false)
  ))

  /** Per-(address, ingest-batch) slot-window stats (schema v5) — the
    * file-level analogue of the reference's inputsByAddress /
    * inputsByPaymentCredential B-trees (SQLite.hs:1159-1190): one compact
    * row per distinct address per batch carrying [min,max] creation slot.
    * An address-scoped query (P3/P4/P5/P6) probes this table (bloom-served)
    * for two longs and prunes inputs SEGMENTS with the window — the v3
    * blooms skip row groups inside a file, this skips whole files. Same
    * superset invariant as [[policiesType]]: every ingest/backfill writes
    * it, mutations may leave stale rows (window only widens), a missing
    * row cannot occur. payment_credential is null for bootstrap
    * addresses. */
  val addressStatsType: StructType = StructType(Seq(
    StructField("address", StringType, nullable = false),
    StructField("payment_credential", StringType, nullable = true),
    StructField("min_slot", LongType, nullable = false),
    StructField("max_slot", LongType, nullable = false)
  ))

  /** Per-(table, column, segment) key-membership sketches (schema v6) —
    * the SEGMENT-level half of the point-lookup index. Parquet blooms
    * (schema v3) let a task skip every ROW GROUP inside a segment, but a
    * point query still schedules one task per segment just to open each
    * footer — at 100 TB that is the whole cost (SCALE.md §F.4). This table
    * moves the membership test ahead of scheduling: one row per live
    * segment of a hash-keyed table, holding a serialized
    * [[org.apache.spark.util.sketch.BloomFilter]] over `xxhash64(key)`;
    * a point lookup filters THIS narrow table (distributed, one row per
    * segment) and scans only candidate segments. INVARIANT: a bloom never
    * false-negatives, so a segment containing the key is always a
    * candidate; a live segment with NO row here is scanned conservatively;
    * stale rows for dead segments are never consulted (the probe is keyed
    * by the live manifest's paths). */
  val segmentBloomsType: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("segment_path", StringType, nullable = false),
    StructField("bloom", BinaryType, nullable = false)
  ))

  /** Slots per physical partition bucket of `inputs`. */
  val BucketSize: Long = 100000L
}
