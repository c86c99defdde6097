package graft

import graft.codec.{Bech32, Blake2b, Hex}
import graft.model.Address
import org.apache.spark.sql.functions._

/** Native kernel expressions: byte-identical to the pure codecs, correct
  * null propagation, and running inside whole-stage codegen. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val onChain = "01" + ("ab" * 28) + ("cd" * 28)
  private val bech = Bech32.encode("addr", Hex.decode(onChain).get)

  test("kupoAddress matches the model serializer across encodings") {
    val df = Seq(bech, onChain, "not-an-address", null)
      .toDF("a").select(GraftFunctions.kupoAddress(col("a")).as("k"))
    val out = df.collect().map(r => Option(r.getString(0)))
    val expected = Address.fromOnChainBytes(Hex.decode(onChain).get)
    assert(out(0) == expected)
    assert(out(1) == expected)
    assert(out(2).isEmpty && out(3).isEmpty)
  }

  test("blake2b expressions match the codec; invalid hex yields null") {
    val payload = "d87980"
    val df = Seq(payload, "zz", null).toDF("h").select(
      GraftFunctions.blake2b224Hex(col("h")).as("h224"),
      GraftFunctions.blake2b256Hex(col("h")).as("h256"))
    val rows = df.collect()
    assert(rows(0).getString(0) == Hex.encode(Blake2b.hash224(Hex.decode(payload).get)))
    assert(rows(0).getString(1) == Hex.encode(Blake2b.hash256(Hex.decode(payload).get)))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("expressions stay inside WholeStageCodegen (no UDF fence)") {
    // spark.range keeps the pipeline in codegen (a local Seq would be
    // constant-folded into a LocalTableScan at plan time)
    val df = spark.range(100)
      .select(lower(hex(col("id"))).as("h4"))
      .select(concat(lit("ab"), lpad(col("h4"), 4, "0")).as("h"))
      .select(GraftFunctions.blake2b256Hex(col("h")).as("digest"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(df.where(col("digest").isNotNull).count() == 100)
  }

  test("SQL surface via registration: kupo_address / blake2b256_hex") {
    GraftFunctions.register(spark)
    Seq(bech).toDF("a").createOrReplaceTempView("addrs")
    val viaSql = spark.sql("SELECT kupo_address(a) AS k FROM addrs").head().getString(0)
    assert(Option(viaSql) == Address.fromOnChainBytes(Hex.decode(onChain).get))
    assert(spark.sql("SELECT blake2b256_hex('d87980')").head().getString(0)
      == Hex.encode(Blake2b.hash256(Hex.decode("d87980").get)))
  }

  test("SQL surface: native_script_cbor / metadatum_schema") {
    GraftFunctions.register(spark)
    val kh = "3c07030e36bfffe67e2e2ec09e5293d384637cd2f004356ef320f3fe"
    assert(spark.sql(
      s"""SELECT native_script_cbor('{"clause":"signature","from":"$kh"}')""")
      .head().getString(0) == "008200581c" + kh)
    assert(spark.sql(
      """SELECT metadatum_schema('{"json":{"msg":[42]}}')""").head().getString(0)
      == """{"map":[{"k":{"string":"msg"},"v":{"list":[{"int":42}]}}]}""")
    assert(spark.sql("""SELECT metadatum_schema('{"cbor":"a11902d1a0"}')""")
      .head().getString(0) == """{"map":[{"k":{"int":721},"v":{"map":[]}}]}""")
    // malformed inputs are nulls, not failures (decoder semantics)
    assert(spark.sql("""SELECT native_script_cbor('{"clause":"nope"}')""").head().isNullAt(0))
    assert(spark.sql("""SELECT metadatum_schema('{"cbor":"zz"}')""").head().isNullAt(0))
  }
}
