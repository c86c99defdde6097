package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The F8 response-surface combo space — every datum kind × script kind ×
  * spent shape × asset shape as one pre-projection result frame. Shared by
  * ApiJsonPropertySpec (hand-coded rule sweep) and OpenApiSpec (validation
  * against the reference's own OpenAPI document). */
object ApiComboFixture {

  final case class Combo(id: Int, datum: String, script: String, spent: String, assets: String)

  val combos: Seq[Combo] = (for {
    d <- Seq("none", "hash", "inline")
    sc <- Seq("none", "native", "v1", "v2", "v3", "corrupt")
    sp <- Seq("unspent", "spent", "spent_noredeemer")
    a <- Seq("empty", "multi")
  } yield (d, sc, sp, a)).zipWithIndex.map { case ((d, sc, sp, a), i) => Combo(i, d, sc, sp, a) }

  val pHi: String = "ff" * 28
  val pLo: String = "aa" * 28
  val scriptBytes: Map[String, String] = Map(
    "native" -> "0082051896", "v1" -> "014e4d0100", "v2" -> "024e4d0200",
    "v3" -> "034e4d0300", "corrupt" -> "7bdeadbeef")
  val languageOf: Map[String, String] = Map(
    "native" -> "native", "v1" -> "plutus:v1", "v2" -> "plutus:v2",
    "v3" -> "plutus:v3", "corrupt" -> "unknown")

  val schema: StructType = StructType(Seq(
    StructField("transaction_index", IntegerType, nullable = false),
    StructField("transaction_id", StringType, nullable = false),
    StructField("output_index", IntegerType, nullable = false),
    StructField("address", StringType, nullable = false),
    StructField("value", StructType(Seq(
      StructField("coins", DecimalType(38, 0), nullable = false),
      StructField("assets",
        MapType(StringType, MapType(StringType, DecimalType(38, 0))), nullable = true))),
      nullable = false),
    StructField("datum_hash", StringType, nullable = true),
    StructField("datum_type", StringType, nullable = true),
    StructField("datum", StringType, nullable = true),
    StructField("script_hash", StringType, nullable = true),
    StructField("script", StringType, nullable = true),
    StructField("created_at", StructType(Seq(
      StructField("slot_no", LongType, nullable = false),
      StructField("header_hash", StringType, nullable = false))), nullable = false),
    StructField("spent_at", StructType(Seq(
      StructField("slot_no", LongType, nullable = false),
      StructField("header_hash", StringType, nullable = false),
      StructField("transaction_id", StringType, nullable = true),
      StructField("input_index", IntegerType, nullable = true),
      StructField("redeemer", StringType, nullable = true))), nullable = true)))

  def rowOf(c: Combo): Row = {
    val assets = c.assets match {
      case "empty" => null
      case "multi" => Map(
        pHi -> Map("" -> BigDecimal(5)),
        pLo -> Map("abcd" -> BigDecimal(7), "0000" -> BigDecimal(9)))
    }
    val (dHash, dType, dBytes) = c.datum match {
      case "none"   => (null, null, null)
      case "hash"   => ("dd" * 32, "hash", null) // reference datum, unresolved
      case "inline" => ("ee" * 32, "inline", "d87980")
    }
    val (sHash, sBytes) =
      if (c.script == "none") (null, null) else ("77" * 28, scriptBytes(c.script))
    val spent = c.spent match {
      case "unspent"          => null
      case "spent"            => Row(90L, "90" * 32, "cc" * 32, 2, "4d0101")
      case "spent_noredeemer" => Row(90L, "90" * 32, "cc" * 32, 2, null)
    }
    Row(c.id, f"${c.id}%064d", c.id % 4, "0361" + "ab" * 28,
      Row(BigDecimal(1000 + c.id), assets),
      dHash, dType, dBytes, sHash, sBytes,
      Row(10L + c.id, "10" * 32), spent)
  }

  def frame(spark: SparkSession): DataFrame = spark.createDataFrame(
    spark.sparkContext.parallelize(combos.map(rowOf), 4), schema)
}
