package graft

import graft.index.GraftIndex
import graft.ingest.{BlockReader, Indexer}
import graft.model.Pattern
import org.apache.spark.sql.functions._

/** S2 — Ogmios-shaped JSON ingestion. The fixture below is hand-authored to
  * the wire shape of the reference's golden vector
  * (/root/reference/test/vectors/golden/1.json) and its decoder field set
  * (/root/reference/src/Kupo/Data/Ogmios.hs:195-298). */
class BlockReaderSpec extends SparkSpec {
  import spark.implicits._

  // bech32 of on-chain base address 0x01 ‖ payment(28×0x11) ‖ delegation(28×0x22)
  private val paymentHex = "11" * 28
  private val delegationHex = "22" * 28
  private val onChain = "01" + paymentHex + delegationHex
  private lazy val bech32Addr = {
    val bytes = graft.codec.Hex.decode(onChain).get
    graft.codec.Bech32.encode("addr", bytes)
  }

  private def fwd(slot: Long, id: String, txs: String) =
    s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"forward","block":{"type":"praos","era":"babbage","id":"$id","slot":$slot,"height":${slot / 10},"transactions":[$txs]},"tip":{"slot":999,"id":"${"t" * 64}"}}}"""

  private val tx1 =
    s"""{"id":"${"aa" * 32}","spends":"inputs",
       |"inputs":[{"transaction":{"id":"${"bb" * 32}"},"index":0}],
       |"outputs":[
       |  {"address":"$bech32Addr","value":{"ada":{"lovelace":5000000}}},
       |  {"address":"$bech32Addr",
       |   "value":{"ada":{"lovelace":2000000},"${"cc" * 28}":{"deadbeef":42}},
       |   "datumHash":"${"dd" * 32}",
       |   "script":{"language":"plutus:v2","cbor":"49480100002221200101"}}],
       |"datums":{"${"ee" * 32}":"d87980"},
       |"scripts":{"${"77" * 28}":{"language":"plutus:v1","cbor":"4e4d01000033222220051200120011"}},
       |"redeemers":[{"validator":{"purpose":"spend","index":0},"redeemer":"d87a80"},
       |             {"validator":{"purpose":"mint","index":0},"redeemer":"00"}],
       |"metadata":{"hash":"${"ff" * 32}","labels":{"674":"{}","1337":"{}"}}}""".stripMargin.replaceAll("\n", "")

  // invalid transaction: spends collaterals, 2 phantom outputs, collateral
  // return becomes the only produced output at index 2
  private val tx2 =
    s"""{"id":"${"ab" * 32}","spends":"collaterals",
       |"collaterals":[{"transaction":{"id":"${"aa" * 32}"},"index":0}],
       |"outputs":[{"address":"$bech32Addr","value":{"ada":{"lovelace":1}}},
       |           {"address":"$bech32Addr","value":{"ada":{"lovelace":2}}}],
       |"collateralReturn":{"address":"$bech32Addr","value":{"ada":{"lovelace":7000000}}}}""".stripMargin.replaceAll("\n", "")

  private val rollbackLine =
    s"""{"jsonrpc":"2.0","method":"nextBlock","result":{"direction":"backward","point":{"slot":100,"id":"${"99" * 32}"},"tip":{"slot":999,"id":"${"t" * 64}"}}}"""

  private lazy val lines = Seq(
    fwd(100, "11" * 32, tx1),
    fwd(110, "12" * 32, tx2),
    rollbackLine)

  private lazy val env = BlockReader.parseEnvelope(lines.toDF("raw"))

  test("forward blocks parse into the engine block schema") {
    val blocks = BlockReader.blocks(env)
    assert(blocks.schema == Schemas.blockType ||
      blocks.select(Schemas.blockType.fieldNames.map(col): _*).columns.length == 3)
    val rows = blocks.orderBy("slot_no").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 100L && rows(0).getString(1) == "11" * 32)
  }

  test("addresses are normalized to kupo hex; value splits coins/assets") {
    val blocks = BlockReader.blocks(env)
    val outs = blocks.select(posexplode(col("txs")).as(Seq("ti", "tx")))
      .select(col("tx.id").as("txid"), posexplode(col("tx.outputs")).as(Seq("oi", "out")))
      .where(col("out").isNotNull)
      .select(col("txid"), col("oi"), col("out.address"), col("out.value.coins"),
        col("out.value.assets"), col("out.datum"), col("out.script_hash"))
      .collect()
    // ground truth from the model's serializer (Database.hs:568-599 semantics)
    val kupoForm = graft.model.Address
      .fromOnChainBytes(graft.codec.Hex.decode(onChain).get).get
    assert(outs.forall(_.getString(2) == kupoForm))
    val withAsset = outs.find(r => r.getInt(1) == 1 && r.getString(0) == "aa" * 32).get
    assert(withAsset.getDecimal(3).longValue == 2000000L)
    assert(withAsset.getMap[String, Map[String, java.math.BigDecimal]](4).contains("cc" * 28))
    assert(withAsset.getStruct(5).getByte(0) == 0.toByte) // reference datum flag
    assert(withAsset.getStruct(5).getString(1) == "dd" * 32)
    assert(withAsset.getString(6) != null) // blake2b-224 of tagged plutus bytes
  }

  test("invalid tx: collateral inputs spend; only collateral return at index |outputs|") {
    val blocks = BlockReader.blocks(env)
    val tx = blocks.where(col("slot_no") === 110)
      .select(explode(col("txs")).as("tx")).select("tx.*").collect().head
    val inputs = tx.getSeq[org.apache.spark.sql.Row](1)
    assert(inputs.length == 1 && inputs.head.getString(0) == "aa" * 32)
    val outputs = tx.getSeq[org.apache.spark.sql.Row](2)
    assert(outputs.length == 3)
    assert(outputs(0) == null && outputs(1) == null)
    assert(outputs(2).getStruct(1).getDecimal(0).longValue == 7000000L)
  }

  test("spend redeemers keep only spend purpose; metadata labels to longs") {
    val blocks = BlockReader.blocks(env)
    val tx = blocks.where(col("slot_no") === 100)
      .select(explode(col("txs")).as("tx")).select("tx.*").collect().head
    val redeemers = tx.getMap[Int, String](5)
    assert(redeemers == Map(0 -> "d87a80"))
    assert(tx.getSeq[Long](6).sorted == Seq(674L, 1337L))
    assert(tx.getMap[String, String](3) == Map(("ee" * 32) -> "d87980"))
    // witnessed script: value tagged with the language byte (plutus:v1 = 01)
    assert(tx.getMap[String, String](4) ==
      Map(("77" * 28) -> "014e4d01000033222220051200120011"))
  }

  test("rollback envelopes surface as points") {
    val rb = BlockReader.rollbacks(env).collect()
    assert(rb.length == 1 && rb.head.getLong(0) == 100L)
  }

  test("native scripts serialize to the reference's Timelock CBOR vectors") {
    // the two native rows of /root/reference/test/vectors/scripts.csv,
    // reconstructed as wire clause trees — byte-for-byte CBOR parity
    val kh1 = "3c07030e36bfffe67e2e2ec09e5293d384637cd2f004356ef320f3fe"
    val kh2 = "3c07030e36bfffe67e2e2ec09e5293d384637cd2f004356ef320f333"
    val sig = (h: String) => s"""{"clause":"signature","from":"$h"}"""
    val allOf2 = s"""{"clause":"all","from":[${sig(kh1)},${sig(kh2)}]}"""
    val allOfTimed =
      s"""{"clause":"all","from":[${sig(kh1)},{"clause":"after","slot":100},{"clause":"before","slot":150}]}"""
    val got = Seq(allOf2, allOfTimed).toDF("j")
      .select(graft.GraftFunctions.nativeScriptCbor(col("j"))).collect().map(_.getString(0))
    assert(got(0) == "008201828200581c" + kh1 + "8200581c" + kh2)
    assert(got(1) == "008201838200581c" + kh1 + "82041864" + "82051896")
    // some/atLeast + malformed clause
    val more = Seq(
      s"""{"clause":"some","atLeast":1,"from":[${sig(kh1)}]}""",
      """{"clause":"nonsense"}""").toDF("j")
      .select(graft.GraftFunctions.nativeScriptCbor(col("j"))).collect()
    assert(more(0).getString(0) == "0083030181" + "8200581c" + kh1)
    assert(more(1).isNullAt(0))
  }

  test("inline native script: hashed and stored through the wire reader") {
    val kh = "3c07030e36bfffe67e2e2ec09e5293d384637cd2f004356ef320f3fe"
    val txN =
      s"""{"id":"${"cd" * 32}","spends":"inputs","inputs":[],
         |"outputs":[{"address":"$bech32Addr","value":{"ada":{"lovelace":1}},
         |  "script":{"language":"native","json":{"clause":"signature","from":"$kh"}}}]}"""
        .stripMargin.replaceAll("\n", "")
    val e = BlockReader.parseEnvelope(Seq(fwd(300, "31" * 32, txN)).toDF("raw"))
    val out = BlockReader.blocks(e)
      .select(explode(col("txs")).as("tx"))
      .select(explode(col("tx.outputs")).as("out")).select("out.*").collect().head
    val expectedBytes = "00" + "8200581c" + kh
    assert(out.getAs[String]("script_bytes") == expectedBytes)
    val expectedHash = graft.codec.Hex.encode(graft.codec.Blake2b.hash(28,
      graft.codec.Hex.decode(expectedBytes).get))
    assert(out.getAs[String]("script_hash") == expectedHash)
  }

  test("golden vector: the reference's recorded Ogmios response parses") {
    // the actual wire fixture the reference pins its decoders to
    // (/root/reference/test/vectors/golden/1.json, used by OgmiosSpec) — a
    // Mary-era mainnet block with 11 txs, bech32 + pointer + Byron addresses
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/test/vectors/golden/1.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val oneLine = raw.replace("\n", "") // pretty-printed → single JSONL line
    val genv = BlockReader.parseEnvelope(Seq(oneLine).toDF("raw"))
    val blocks = BlockReader.blocks(genv).collect()
    assert(blocks.length == 1)
    val blk = blocks.head
    assert(blk.getLong(0) == 26366727L)
    assert(blk.getString(1) == "afcb6d128c1c09abd11601b22ccae05c4af29bb9768884d985f61f4d6db23ed9")
    val txs = blk.getSeq[org.apache.spark.sql.Row](2)
    assert(txs.length == 11)
    assert(txs.map(_.getSeq[org.apache.spark.sql.Row](1).length).sum == 18) // inputs
    val outs = txs.flatMap(_.getSeq[org.apache.spark.sql.Row](2))
    assert(outs.length == 23 && outs.forall(_ != null))
    // first input of the first tx, straight from the vector
    val firstIn = txs.head.getSeq[org.apache.spark.sql.Row](1).head
    assert(firstIn.getString(0) == "37bd6f94819f37c2329f11304a96affa5ce0b7d67d4e9cf7aca40702dcca1c6c")
    assert(firstIn.getInt(1) == 0)
    // total lovelace across all outputs (fixed by the vector)
    val totalCoins = outs.map(_.getStruct(1).getDecimal(0).longValueExact()).sum
    assert(totalCoins == 173196229927L)
    // every address normalized to the kupo form: tag byte then hex credentials
    val addrs = outs.map(_.getString(0))
    assert(addrs.forall(a => a != null && a.matches("0[0-3][0-9a-f]+")))
    // cross-check the native kupoAddress expression against the Scala model
    // on the two exotic paths the vector exercises: a pointer address …
    val pointerWire = "addr1gy5p8wv6sr8mgqjrwj7s75pft9y94ftwqey9vnlcqhew2xaumxqe2cdam3npgv60hqa"
    val pointerKupo = graft.model.Address.fromOnChainBytes(
      graft.codec.Bech32.decode(pointerWire).get._2).get
    assert(pointerKupo.startsWith("02") && addrs.contains(pointerKupo))
    // … and a Byron base58 address
    val byronWire = "DdzFFzCqrhtCwu1SwuTR7BbedvHS9iA7pe8LAwGACZkkniEwKNiqdFhVMAFjNSwEKPSqPxvCGwqiBYRJDxBexNRYEnz1aLw6ZVQ4P3cN"
    val byronBytes = graft.codec.Base58.decode(byronWire).get
    assert(graft.model.Address.isValidByron(byronBytes))
    assert(addrs.contains("00" + graft.codec.Hex.encode(byronBytes)))
    assert(addrs.count(_.startsWith("00")) == 11) // 11 Byron outputs in the vector
  }

  test("end-to-end: parsed blocks flow through Indexer into a queryable index") {
    val ix = new GraftIndex(spark, tmpDir("graft-ogmios"))
    Indexer.ingest(ix, BlockReader.blocks(env), Set[Pattern](Pattern.MatchAny(true)))
    // 2 real outputs from tx1 + 1 collateral return from tx2
    assert(ix.table("inputs").count() == 3)
    val spent = ix.inputsWithSpends.where(col("spent_at").isNotNull).collect()
    // tx2 (invalid) consumed tx1's output 0 via collaterals
    assert(spent.length == 1 && spent.head.getAs[String]("tx_id") == "aa" * 32)
    assert(ix.table("policies").count() == 1)
    assert(ix.table("binary_data").count() == 1)
    assert(ix.table("scripts").count() == 2) // 1 witnessed + 1 inline
  }
}
