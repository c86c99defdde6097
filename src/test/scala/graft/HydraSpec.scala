package graft

import graft.codec.{Blake2b, Cbor, Hex}
import graft.index.GraftIndex
import graft.ingest.{HydraReader, Indexer, TxCbor}
import graft.model.Pattern
import graft.query.{Api, FoldInputs}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** S3 Hydra producer: CBOR reader, Conway tx decoding (TxCbor), message →
  * Ogmios-line bridge, end-to-end ingest. Vectors are hand-built from the
  * published CDDL with a minimal test-side CBOR writer; native-script bytes
  * are pinned to /root/reference/test/vectors/scripts.csv rows. */
class HydraSpec extends SparkSpec {

  // ---- tiny CBOR writer (test-side only) ----
  private def head(major: Int, v: Long): Array[Byte] = {
    val mt = major << 5
    if (v < 24) Array((mt | v.toInt).toByte)
    else if (v < 256) Array((mt | 24).toByte, v.toByte)
    else if (v < 65536) Array((mt | 25).toByte, (v >> 8).toByte, v.toByte)
    else Array((mt | 26).toByte, (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  }
  private def cInt(v: Long): Array[Byte] = head(0, v)
  private def cBytes(b: Array[Byte]): Array[Byte] = head(2, b.length.toLong) ++ b
  private def cBytesHex(h: String): Array[Byte] = cBytes(Hex.decode(h).get)
  private def cArr(items: Array[Byte]*): Array[Byte] =
    head(4, items.length.toLong) ++ items.flatten
  private def cMap(entries: (Array[Byte], Array[Byte])*): Array[Byte] =
    head(5, entries.length.toLong) ++ entries.flatMap { case (k, v) => k ++ v }
  private def cTag(tag: Long, inner: Array[Byte]): Array[Byte] = head(6, tag) ++ inner
  private val cTrue = Array(0xf5.toByte)
  private val cNull = Array(0xf6.toByte)

  // ---- fixture material ----
  private val txIdSpent = "aa" * 32
  // on-chain address bytes (what the ledger CBOR carries) and the kupo hex
  // forms the index stores after normalization (Address.fromOnChainBytes)
  private val addr1Wire = "01" + "22" * 28 + "33" * 28 // base: hdr ‖ payment ‖ delegation
  private val addr1Kupo = "01" + "33" * 28 + "01" + "22" * 28
  private val addr2Wire = "61" + "44" * 28 // enterprise: hdr ‖ payment
  private val addr2Kupo = "03" + "61" + "44" * 28
  private val policy = "cc" * 28
  private val datumBytes = "d87980" // unit constructor plutus data
  private val datumHash = Hex.encode(Blake2b.hash256(Hex.decode(datumBytes).get))
  // plutus v2 script: inner flat bytes (arbitrary but fixed)
  private val v2Flat = "4e4d01000033222220051200120011"
  private val v2Hash = Hex.encode(Blake2b.hash224(Hex.decode("02" + v2Flat).get))
  // native script CBOR from scripts.csv row 2 (sans the 00 tag)
  private val nativeCbor =
    "8201838200581c3c07030e36bfffe67e2e2ec09e5293d384637cd2f004356ef320f3fe8204186482051896"
  private val nativeHash = Hex.encode(Blake2b.hash224(Hex.decode("00" + nativeCbor).get))

  /** A Conway tx: spends (txIdSpent,0); out0 = babbage-map output with
    * assets + inline datum + v2 reference script; out1 = legacy array output
    * with a datum hash; witnesses carry the datum preimage, a spend
    * redeemer (map form), the v2 script (tag-258 set) and a native script. */
  private def buildBody(): Array[Byte] = {
    val input = cArr(cBytesHex(txIdSpent), cInt(0))
    val out0 = cMap(
      cInt(0) -> cBytesHex(addr1Wire),
      cInt(1) -> cArr(cInt(5000), cMap(
        cBytesHex(policy) -> cMap(cBytesHex("abcd") -> cInt(7)))),
      cInt(2) -> cArr(cInt(1), cTag(24, cBytesHex(datumBytes))),
      cInt(3) -> cTag(24, cBytes(cArr(cInt(2), cBytesHex(v2Flat)))))
    val out1 = cArr(cBytesHex(addr2Wire), cInt(42), cBytesHex("ee" * 32))
    cMap(
      cInt(0) -> cTag(258, cArr(input)),
      cInt(1) -> cArr(out0, out1))
  }

  private def buildWits(): Array[Byte] = cMap(
    cInt(1) -> cArr(Hex.decode(nativeCbor).get), // native script item
    cInt(4) -> cTag(258, cArr(Hex.decode(datumBytes).get)),
    cInt(5) -> cMap( // Conway map-form redeemers
      cArr(cInt(0), cInt(0)) -> cArr(Hex.decode(datumBytes).get, cArr(cInt(1), cInt(2)))),
    cInt(6) -> cTag(258, cArr(cBytesHex(v2Flat))))

  private def buildTx(): (String, String) = { // (cborHex, expected txId)
    val body = buildBody()
    val tx = cArr(body, buildWits(), cTrue, cNull)
    (Hex.encode(tx), Hex.encode(Blake2b.hash256(body)))
  }

  test("CBOR reader: spans, indefinite lengths, tags, negatives") {
    import Cbor._
    // {1: 2, "a": h'FF'} with span checks
    val bytes = Hex.decode("a201026161" + "41ff").get
    val m = Cbor.decode(bytes).asInstanceOf[CMap]
    assert(m.entries.size == 2)
    assert(m.entries(0)._1 == CInt(1, 1, 2))
    assert(m.entries(1)._2.asInstanceOf[CBytes].bytes.sameElements(Array(0xff.toByte)))
    // indefinite bytes 5f 42 0102 43 030405 ff → 0102030405
    val ind = Cbor.decode(Hex.decode("5f42010243030405ff").get).asInstanceOf[CBytes]
    assert(Hex.encode(ind.bytes) == "0102030405")
    // indefinite array [_ 1, 2] and negative int -500
    val arr = Cbor.decode(Hex.decode("9f0102ff").get).asInstanceOf[CArr]
    assert(arr.items.map(_.asInstanceOf[CInt].value) == Vector(BigInt(1), BigInt(2)))
    assert(Cbor.decode(Hex.decode("3901f3").get).asInstanceOf[CInt].value == BigInt(-500))
    // tag 258 set
    val set = Cbor.decode(Hex.decode("d9010281 01".replace(" ", "")).get).asInstanceOf[CTag]
    assert(set.tag == 258)
    // slice returns the exact wire bytes of a nested item
    val nested = Cbor.decode(Hex.decode("8118ff").get).asInstanceOf[CArr]
    assert(Hex.encode(Cbor.slice(Hex.decode("8118ff").get, nested.items(0))) == "18ff")
  }

  test("TxCbor: Conway tx decodes to the Ogmios wire shape, hashes pinned") {
    val (cborHex, expectedId) = buildTx()
    val tx = TxCbor.decodeTx(cborHex).get
    assert(tx.idHex == expectedId)
    val j = tx.json
    assert(j.contains(s""""id":"$expectedId""""))
    assert(j.contains(s""""inputs":[{"transaction":{"id":"$txIdSpent"},"index":0}]"""))
    assert(j.contains(s""""address":"$addr1Wire""""))
    assert(j.contains(s""""value":{"ada":{"lovelace":5000},"$policy":{"abcd":7}}"""))
    assert(j.contains(s""""datum":"$datumBytes"""")) // inline
    assert(j.contains(s""""datumHash":"${"ee" * 32}"""")) // legacy output
    assert(j.contains(s""""script":{"language":"plutus:v2","cbor":"$v2Flat"}""")) // ref script
    assert(j.contains(s""""$datumHash":"$datumBytes"""")) // witness datum map
    assert(j.contains(s""""redeemer":"$datumBytes"""")) // spend redeemer
    assert(j.contains(""""language":"native"""")) // witnessed native script
    // undecodable input → None, not an exception
    assert(TxCbor.decodeTx("deadbeef").isEmpty)
  }

  test("native-script CBOR → clause JSON → CBOR round-trips byte-exactly") {
    import spark.implicits._
    val (cborHex, _) = buildTx()
    val tx = TxCbor.decodeTx(cborHex).get
    // extract the native clause JSON from the emitted scripts map
    val start = tx.json.indexOf(s""""$nativeHash":""")
    assert(start >= 0, s"native hash $nativeHash missing in ${tx.json}")
    val obj = tx.json.substring(start)
    val jsonStart = obj.indexOf(""""json":""") + 7
    var depth = 0; var i = jsonStart
    do {
      if (obj(i) == '{') depth += 1 else if (obj(i) == '}') depth -= 1
      i += 1
    } while (depth > 0)
    val clauseJson = obj.substring(jsonStart, i)
    val reencoded = Seq(clauseJson).toDF("j")
      .select(graft.GraftFunctions.nativeScriptCbor(col("j"))).head().getString(0)
    assert(reencoded == "00" + nativeCbor) // so the recomputed hash matches too
  }

  test("Hydra messages → Ogmios lines → full ingest; header hash per mkHydraBlock") {
    val (cborHex, txId) = buildTx()
    val snapshot =
      s"""{"tag":"SnapshotConfirmed","headId":"00","snapshot":{"number":7,""" +
        s""""confirmed":[{"type":"Tx ConwayEra","cborHex":"$cborHex"}]}}"""
    // genesis head-open with a SPARSE output index (#2): positions must pad
    val genesisTxId = "bb" * 32
    val headOpen =
      s"""{"tag":"HeadIsOpen","headId":"00","utxo":{"$genesisTxId#2":""" +
        s"""{"address":"$addr2Wire","value":{"lovelace":999,"$policy":{"beef":3}}}}}"""
    val txValid = s"""{"tag":"TxValid","transactionId":"${"dd" * 32}"}"""

    // bridge layer: TxValid is a recognized non-block message ("" = benign
    // drop; null is reserved for malformed lines); block ids follow
    // mkHydraBlock
    assert(HydraReader.messageToOgmios(txValid) == "")
    assert(HydraReader.messageToOgmios("not json at all") == null)
    val snapLine = HydraReader.messageToOgmios(snapshot)
    assert(snapLine.contains(s""""slot":7"""))
    assert(snapLine.contains(s""""id":"${Hex.encode(Blake2b.hash256(Hex.decode(txId).get))}""""))
    val genesisLine = HydraReader.messageToOgmios(headOpen)
    assert(genesisLine.contains(s""""slot":0"""))

    // end to end: write all three lines, ingest through the Ogmios pipeline
    val dir = tmpDir("graft-hydra-in")
    Files.write(Paths.get(dir, "000.jsonl"),
      Seq(headOpen, txValid, snapshot).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val blocks = HydraReader.readJsonl(spark, dir)
    val ix = new GraftIndex(spark, tmpDir("graft-hydra-ix"))
    Indexer.ingest(ix, blocks, Set[Pattern](Pattern.MatchAny(includingBootstrap = true)))

    val rows = FoldInputs(ix, Api.MatchesQuery("*", order = Api.SortDirection.Asc))
      .select(col("transaction_id"), col("output_index"), col("address"),
        col("created_at.slot_no").as("slot"), col("datum_hash"), col("script_hash"))
      .collect()
    // genesis utxo at PRESERVED index 2, slot 0
    assert(rows.exists(r => r.getString(0) == genesisTxId && r.getInt(1) == 2 &&
      r.getString(2) == addr2Kupo && r.getLong(3) == 0L))
    // snapshot tx outputs at slot 7 with inline-datum hash + ref-script hash
    assert(rows.exists(r => r.getString(0) == txId && r.getInt(1) == 0 &&
      r.getString(2) == addr1Kupo && r.getLong(3) == 7L &&
      r.getString(4) == datumHash && r.getString(5) == v2Hash))
    assert(rows.exists(r => r.getString(0) == txId && r.getInt(1) == 1 &&
      r.getString(2) == addr2Kupo && r.getString(4) == ("ee" * 32)))
    // witnessed scripts landed in the side table with ledger hashes
    val scripts = ix.table("scripts").select("script_hash").collect().map(_.getString(0)).toSet
    assert(scripts.contains(nativeHash) && scripts.contains(v2Hash))
    // witness datum resolvable by its blake2b-256 hash
    assert(FoldInputs.getBinaryData(ix, datumHash).contains(datumBytes))
  }

  test("S1 data plane: whole block CBOR → Ogmios line → ingest, metadata included") {
    import graft.ingest.BlockCbor
    import graft.query.BlockQueries
    // tx0 = the full Conway tx above (valid); tx1 = phase-2 INVALID tx whose
    // collateral return must become its only produced output
    val body0 = buildBody(); val wits0 = buildWits()
    val collInput = cArr(cBytesHex("99" * 32), cInt(1))
    val body1 = cMap(
      cInt(0) -> cTag(258, cArr()), // no regular inputs
      cInt(1) -> cArr(cArr(cBytesHex(addr2Wire), cInt(50))), // ignored on invalid
      cInt(13) -> cTag(258, cArr(collInput)),
      cInt(16) -> cArr(cBytesHex(addr1Wire), cInt(44)))
    val wits1 = cMap()
    // aux data for tx0: tag 259 {0: {674: "hi"}} ("hi" = CBOR 626869)
    val metadatum = Hex.decode("626869").get
    val aux0 = cTag(259, cMap(cInt(0) -> cMap(cInt(674) -> metadatum)))
    val headerBody = cArr(cInt(5), cInt(77), cBytesHex("00" * 32))
    val header = cArr(headerBody, cBytesHex("77" * 8))
    val block = cArr(header, cArr(body0, body1), cArr(wits0, wits1),
      cMap(cInt(0) -> aux0), cArr(cInt(1)))
    val wrapped = cArr(cInt(6), block) // node-to-client era wrapper
    val headerHash = Hex.encode(Blake2b.hash256(header))
    val tx0Id = Hex.encode(Blake2b.hash256(body0))
    val tx1Id = Hex.encode(Blake2b.hash256(body1))

    val line = BlockCbor.blockToOgmios(Hex.encode(wrapped))
    assert(line != null && line.contains(""""slot":77""") &&
      line.contains(s""""id":"$headerHash"""") && line.contains(""""spends":"collaterals""""))

    val dir = tmpDir("graft-blockcbor-in")
    Files.write(Paths.get(dir, "000.txt"),
      Hex.encode(wrapped).getBytes(StandardCharsets.UTF_8))
    val blocks = BlockCbor.readCborBlocks(spark, dir)
    val ix = new GraftIndex(spark, tmpDir("graft-blockcbor-ix"))
    Indexer.ingest(ix, blocks, Set[Pattern](Pattern.MatchAny(includingBootstrap = true)))

    val rows = FoldInputs(ix, Api.MatchesQuery("*", order = Api.SortDirection.Asc))
      .select(col("transaction_id"), col("output_index"), col("address"),
        col("created_at.slot_no").as("slot"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    // tx0's two outputs, at slot 77 under the block's header hash
    assert(rows.contains((tx0Id, 0, addr1Kupo, 77L)))
    assert(rows.contains((tx0Id, 1, addr2Kupo, 77L)))
    // tx1 is invalid: the declared output is NOT produced; the collateral
    // return appears at index |outputs| = 1
    assert(!rows.exists(r => r._1 == tx1Id && r._2 == 0))
    assert(rows.contains((tx1Id, 1, addr1Kupo, 77L)))
    // R11: the aux metadata flows through to metadata-by-slot with the
    // schema'd rendering of the CBOR metadatum
    val md = BlockQueries.metadataBySlot(blocks, 77L).collect()
    assert(md.length == 1 && md(0).getString(1) == "674")
    assert(md(0).getString(3) == """{"string":"hi"}""")
  }

  test("Byron blocks: main + EBB decode, bootstrap outputs index under *") {
    import graft.ingest.BlockCbor
    import graft.query.BlockQueries
    // bootstrap address envelope [ #6.24(payload), crc32(payload) ]
    val payload = Hex.decode("5a" * 30).get
    val crc = { val c = new java.util.zip.CRC32(); c.update(payload); c.getValue }
    val byronAddr = cArr(cTag(24, cBytes(payload)), cInt(crc))
    val addrKupo = "00" + Hex.encode(byronAddr) // fromOnChainBytes: tag 0 ‖ CBOR
    assert(graft.model.Address.isValidByron(byronAddr))
    // tx = [[txin], [txout], attributes]; txin = [0, #6.24([txid, ix])]
    val txin = cArr(cInt(0), cTag(24, cBytes(cArr(cBytesHex("aa" * 32), cInt(3)))))
    val tx = cArr(cArr(txin), cArr(cArr(byronAddr, cInt(123456))), cMap())
    val txId = Hex.encode(Blake2b.hash256(tx))
    val txaux = cArr(tx, cArr())
    val mainBody = cArr(cArr(txaux), cArr(), cArr(), cArr()) // ssc/dlg/upd ignored
    // header = [magic, prev, proof, consensus, extra];
    // consensus = [[epoch, slot], pubkey, [difficulty], sig]
    val consensus = cArr(cArr(cInt(2), cInt(135)), cBytesHex("cc" * 32),
      cArr(cInt(42)), cBytesHex("dd" * 8))
    val header = cArr(cInt(764824073), cBytesHex("00" * 32), cBytesHex("bb" * 32),
      consensus, cArr())
    val mainBlock = cArr(cInt(1), cArr(header, mainBody, cArr()))
    // ledger hashes the VARIANT-WRAPPED header
    val mainHash = Hex.encode(Blake2b.hash256(cArr(cInt(1), header)))
    val wrapped = cArr(cInt(0), cTag(24, cBytes(mainBlock))) // node-to-client wrap
    // EBB: ebbhead = [magic, prev, proof, [epoch, difficulty], extra]; bare line
    val ebbHeader = cArr(cInt(764824073), cBytesHex("ee" * 32), cBytesHex("ff" * 32),
      cArr(cInt(3), cArr(cInt(43))), cArr())
    val ebb = cArr(cInt(0), cArr(ebbHeader, cArr(), cArr()))
    val ebbHash = Hex.encode(Blake2b.hash256(cArr(cInt(0), ebbHeader)))

    val mainLine = BlockCbor.blockToOgmios(Hex.encode(wrapped))
    assert(mainLine != null, "main block must decode")
    assert(mainLine.contains(s""""slot":${2 * 21600 + 135}""") &&
      mainLine.contains(""""height":42""") &&
      mainLine.contains(s""""id":"$mainHash"""") &&
      mainLine.contains(s""""id":"$txId""""))
    val ebbLine = BlockCbor.blockToOgmios(Hex.encode(ebb))
    assert(ebbLine != null, "EBB must decode")
    assert(ebbLine.contains(s""""slot":${3 * 21600}""") &&
      ebbLine.contains(s""""id":"$ebbHash"""") &&
      ebbLine.contains(""""transactions":[]"""))

    val dir = tmpDir("graft-byron-in")
    Files.write(Paths.get(dir, "000.txt"),
      (Hex.encode(wrapped) + "\n" + Hex.encode(ebb)).getBytes(StandardCharsets.UTF_8))
    val blocks = BlockCbor.readCborBlocks(spark, dir)
    assert(blocks.count() == 2) // the EBB is a real (empty) block/point
    val ix = new GraftIndex(spark, tmpDir("graft-byron-ix"))
    Indexer.ingest(ix, blocks, Set[Pattern](Pattern.MatchAny(includingBootstrap = true)))
    val rows = FoldInputs(ix, Api.MatchesQuery("*", order = Api.SortDirection.Asc))
      .select(col("transaction_id"), col("output_index"), col("address"),
        col("created_at.slot_no").as("slot"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(rows.toSet == Set((txId, 0, addrKupo, (2L * 21600 + 135))))
    // OnlyShelley (P2) must NOT see the bootstrap output
    val shelleyIx = new GraftIndex(spark, tmpDir("graft-byron-ix2"))
    Indexer.ingest(shelleyIx, blocks, Set[Pattern](Pattern.MatchAny(includingBootstrap = false)))
    assert(FoldInputs(shelleyIx, Api.MatchesQuery("*", order = Api.SortDirection.Asc)).count() == 0)
    // Byron txs carry no metadata
    assert(BlockQueries.metadataBySlot(blocks, 2L * 21600 + 135).isEmpty)
  }

  test("strict ingest fails loudly on an undecodable line; lenient opts out") {
    import graft.ingest.BlockCbor
    // one corrupt line sandwiched between two good Byron blocks
    val ebbHeader = cArr(cInt(764824073), cBytesHex("ee" * 32), cBytesHex("ff" * 32),
      cArr(cInt(3), cArr(cInt(43))), cArr())
    val good = Hex.encode(cArr(cInt(0), cArr(ebbHeader, cArr(), cArr())))
    val dir = tmpDir("graft-strict-in")
    Files.write(Paths.get(dir, "000.txt"),
      Seq(good, "deadbeef", good).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val err = intercept[Exception] {
      BlockCbor.readCborBlocks(spark, dir).count()
    }
    // the raise carries the offending hex so the gap is diagnosable
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(m => m.contains("undecodable block CBOR") || m.contains("deadbeef")))
    // lenient mode restores drop-malformed
    assert(BlockCbor.readCborBlocks(spark, dir, strict = false).count() == 2)

    // same contract on the Hydra side: malformed JSON raises, TxValid doesn't
    val hdir = tmpDir("graft-strict-hydra")
    Files.write(Paths.get(hdir, "000.jsonl"),
      Seq("""{"tag":"TxValid","transactionId":"00"}""", "{broken json")
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    val raw = spark.read.text(hdir).withColumnRenamed("value", "raw")
    val herr = intercept[Exception] {
      graft.ingest.HydraReader.toOgmiosLines(raw).count()
    }
    assert(messages(herr).exists(_.contains("undecodable Hydra line")))
    assert(graft.ingest.HydraReader.toOgmiosLines(raw, strict = false).count() == 0)
  }

  test("CBOR reader and tx decoder never crash or hang on arbitrary bytes") {
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      // decode either succeeds or throws a controlled exception; decodeTx
      // always returns an Option
      try { Cbor.decode(b); () } catch { case scala.util.control.NonFatal(_) => () }
      assert(TxCbor.decodeTx(Hex.encode(b)).isEmpty ||
        TxCbor.decodeTx(Hex.encode(b)).isDefined) // total, no throw
      assert(graft.ingest.BlockCbor.blockToOgmios(Hex.encode(b)) == null ||
        true)
    }
    // truncations of a VALID tx must degrade to None, never throw
    val (cborHex, _) = buildTx()
    (1 until cborHex.length / 2).by(7).foreach { cut =>
      assert(TxCbor.decodeTx(cborHex.take(cut * 2)).isEmpty)
    }
  }

  test("Hydra streaming drain: file stream -> index, checkpoint resumes") {
    val (cborHex, txId) = buildTx()
    val in = tmpDir("graft-hydra-stream-in")
    val ix = new GraftIndex(spark, tmpDir("graft-hydra-stream-ix"))
    val patterns = Set[Pattern](Pattern.MatchAny(includingBootstrap = true))
    Files.write(Paths.get(in, "000.jsonl"),
      (s"""{"tag":"SnapshotConfirmed","headId":"00","snapshot":{"number":3,""" +
        s""""confirmed":[{"cborHex":"$cborHex"}]}}""").getBytes(StandardCharsets.UTF_8))
    val q1 = HydraReader.start(spark, in, ix, patterns)
    q1.awaitTermination()
    assert(ix.table("inputs").where(col("tx_id") === txId).count() == 2)
    assert(ix.table("checkpoints").agg(max("slot_no")).head().getLong(0) == 3L)
    // restart: consumed file is not reprocessed; a TxValid-only file adds nothing
    Files.write(Paths.get(in, "001.jsonl"),
      s"""{"tag":"TxValid","transactionId":"${"dd" * 32}"}""".getBytes(StandardCharsets.UTF_8))
    val q2 = HydraReader.start(spark, in, ix, patterns)
    q2.awaitTermination()
    assert(ix.table("inputs").count() == 2)
  }
}
