package graft.queries

import graft.Schemas
import graft.index.GraftIndex
import graft.query.{Api, FoldInputs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import QueryDef.table

/** The flagship end-to-end check: a kupo index DERIVED deterministically from
  * the driver tables, written through the real GraftIndex, queried through
  * the real FoldInputs — and the whole derivation+query mirrored as one
  * DuckDB CTE so the oracle can hash-compare it (SURVEY.md §7.3's minimum
  * slice, re-expressed over the shared testdata).
  *
  * Derivation (lineitem row → index row):
  *   transaction_id    = md5(l_orderkey)          (stand-in txid)
  *   output_index      = l_linenumber
  *   transaction_index = l_orderkey % 7
  *   address           = '01' ‖ lpad(l_partkey % 40, 56, '0')   (delegation)
  *                            ‖ '01' ‖ lpad(l_suppkey, 56, '0') (payment)
  *   coins             = l_quantity (integral)
  *   created_at        = l_orderkey (slot)
  *   spent_at          = l_orderkey + 5 when l_returnflag = 'R'
  *   checkpoints       = every created/spent slot, header = md5(slot)
  */
object KupoPipelineQueries {

  /** Delegation credential the flagship query filters on (l_partkey % 40 == 7). */
  private val cred7 = "0" * 55 + "7"

  private def derivedInputs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem").select(
      md5(col("l_orderkey").cast("string")).as("tx_id"),
      col("l_linenumber").as("output_index"),
      (col("l_orderkey") % 7).cast("int").as("transaction_index"),
      concat(lit("01"), lpad((col("l_partkey") % 40).cast("string"), 56, "0"),
             lit("01"), lpad(col("l_suppkey").cast("string"), 56, "0")).as("address"),
      lpad(col("l_suppkey").cast("string"), 56, "0").as("payment_credential"),
      struct(col("l_quantity").cast(DecimalType(38, 0)).as("coins"),
             map().cast(Schemas.valueType("assets").dataType).as("assets")).as("value"),
      lit(null).cast(Schemas.datumInfoType).as("datum_info"),
      lit(null).cast("string").as("script_hash"),
      col("l_orderkey").as("created_at"),
      when(col("l_returnflag") === "R", col("l_orderkey") + 5)
        .otherwise(lit(null)).cast("long").as("spent_at"),
      lit(null).cast(Schemas.spentByType).as("spent_by"),
      lit(null).cast("string").as("spent_with"),
      (col("l_orderkey") / Schemas.BucketSize).cast("long").as("created_bucket"))

  private val cache = scala.collection.mutable.Map.empty[String, GraftIndex]

  /** Build (once per sfDir per JVM) a real GraftIndex from the derivation —
    * the index is immutable here, so the three kupo queries share it the way
    * a deployment shares one index across many reads. */
  def buildIndex(s: SparkSession, dir: String): GraftIndex = synchronized {
    cache.getOrElseUpdate(dir, buildIndexUncached(s, dir))
  }

  private def buildIndexUncached(s: SparkSession, dir: String): GraftIndex = {
    val ix = new GraftIndex(s, java.nio.file.Files.createTempDirectory("graft-kupo").toString)
    val inputs = derivedInputs(s, dir)
    val checkpoints = inputs.select(col("created_at").as("slot_no"))
      .union(inputs.where(col("spent_at").isNotNull).select(col("spent_at")))
      .distinct()
      .select(col("slot_no"), md5(col("slot_no").cast("string")).as("header_hash"))
    ix.replace("inputs", inputs)
    ix.replace("checkpoints", checkpoints)
    ix
  }

  private def flat(res: DataFrame): DataFrame = res.select(
    col("transaction_id"), col("output_index"), col("transaction_index"),
    col("address"), col("value.coins").as("coins"),
    col("created_at.slot_no").as("created_slot"),
    col("created_at.header_hash").as("created_hash"))

  private val derivationSql =
    """WITH inputs AS (
      |  SELECT md5(CAST(l_orderkey AS VARCHAR)) AS transaction_id,
      |         l_linenumber AS output_index,
      |         CAST(l_orderkey % 7 AS INT) AS transaction_index,
      |         '01' || lpad(CAST(l_partkey % 40 AS VARCHAR), 56, '0')
      |              || '01' || lpad(CAST(l_suppkey AS VARCHAR), 56, '0') AS address,
      |         CAST(l_quantity AS DECIMAL(38,0)) AS coins,
      |         l_orderkey AS created_at,
      |         CASE WHEN l_returnflag = 'R' THEN l_orderkey + 5 ELSE NULL END AS spent_at
      |  FROM lineitem)
      |""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // F1+F2+F3+F4+F6+F8: delegation pattern, created range, unspent only,
    // checkpoint join, 3-key desc order — GET /matches/*/{cred}.
    QueryDef("q_kupo_fold_inputs",
      (s, d) => {
        val ix = buildIndex(s, d)
        flat(FoldInputs(ix, Api.MatchesQuery(
          s"*/$cred7",
          range = Api.SlotRange(Api.RangeField.CreatedAt, Some(100L), Some(3000L)),
          status = Api.StatusFlag.OnlyUnspent,
          order = Api.SortDirection.Desc)))
      },
      Some(derivationSql +
        s"""SELECT transaction_id, output_index, transaction_index, address, coins,
           |       created_at AS created_slot,
           |       md5(CAST(created_at AS VARCHAR)) AS created_hash
           |FROM inputs
           |WHERE address LIKE '01$cred7%'
           |  AND created_at BETWEEN 100 AND 3000
           |  AND spent_at IS NULL
           |ORDER BY created_at DESC, transaction_index DESC, output_index DESC""".stripMargin)),

    // Spent-side range query: ?spent_after & ?spent_before over the wildcard
    // pattern, with spent-point header hashes (F2 on spent_at + F4 left join).
    QueryDef("q_kupo_spent_range",
      (s, d) => {
        val ix = buildIndex(s, d)
        FoldInputs(ix, Api.MatchesQuery(
          "*",
          range = Api.SlotRange(Api.RangeField.SpentAt, Some(500L), Some(1500L)),
          order = Api.SortDirection.Asc))
          .select(col("transaction_id"), col("output_index"),
            col("spent_at.slot_no").as("spent_slot"),
            col("spent_at.header_hash").as("spent_hash"))
      },
      Some(derivationSql +
        """SELECT transaction_id, output_index, spent_at AS spent_slot,
          |       md5(CAST(spent_at AS VARCHAR)) AS spent_hash
          |FROM inputs
          |WHERE spent_at IS NOT NULL AND spent_at BETWEEN 500 AND 1500
          |ORDER BY created_at ASC, transaction_index ASC, output_index ASC""".stripMargin)),

    // R1 countInputs under a payment-credential pattern (suffix equality).
    QueryDef("q_kupo_count_by_payment",
      (s, d) => {
        val ix = buildIndex(s, d)
        val cred3 = "0" * 55 + "3"
        import s.implicits._
        Seq(FoldInputs.countInputs(ix, s"$cred3/*")).toDF("n")
      },
      Some(derivationSql +
        s"""SELECT count(*) AS n FROM inputs
           |WHERE address LIKE '01%' AND address LIKE '%${"0" * 55 + "3"}'""".stripMargin))
  )
}
