package graft

import graft.index.{GraftIndex, Mutations}
import graft.ingest.Indexer
import graft.model.Pattern
import graft.query.{Api, BlockQueries, FoldInputs}
import graft.tools.FixtureChain
import org.apache.spark.sql.functions._

/** S4/S5/R11 block queries, S9 filtered copy, F8 JSON projection. */
class ApiSurfaceSpec extends SparkSpec {

  private lazy val blocks = FixtureChain.chain(10)
  private def blocksDf = FixtureChain.toDf(spark, blocks)

  test("S4/S5: fetchBlock point lookup and fetchTip") {
    assert(BlockQueries.fetchBlock(blocksDf, 30L).count() == 1)
    assert(BlockQueries.fetchBlock(blocksDf, 31L).count() == 0)
    val tip = BlockQueries.fetchTip(blocksDf)
    assert(tip.map(_._1).contains(100L))
    assert(tip.map(_._2).contains(blocks.last.headerHash))
  }

  test("R11: metadata by slot, optionally filtered by transaction id") {
    // block 0 (slot 10) carries metadata on both txs
    val all = BlockQueries.metadataBySlot(blocksDf, 10L).collect()
    assert(all.length == 4) // 2 txs × 2 labels
    assert(all.map(_.getString(1)).distinct.sorted.sameElements(Array("674", "721")))
    val one = BlockQueries.metadataBySlot(blocksDf, 10L, Some(blocks.head.txs.head.id))
    assert(one.count() == 2)
    // slot without metadata (odd block index) → empty
    assert(BlockQueries.metadataBySlot(blocksDf, 20L).count() == 0)
  }

  test("S9: copyFiltered bootstraps a pattern-restricted index") {
    val src = new GraftIndex(spark, tmpDir("graft-copy-src"))
    Indexer.ingest(src, blocksDf, Set[Pattern](Pattern.MatchAny(true)))
    val delCred = FixtureChain.baseAddr(0, 0).substring(2, 58)
    val p = Pattern.fromText(s"*/$delCred").get

    val dst = Mutations.copyFiltered(src, tmpDir("graft-copy-dst"), Set(p))
    val expected = src.inputsWithSpends.where(p.toPredicate).count()
    assert(dst.table("inputs").count() == expected && expected > 0)
    // every surviving datum/script hash resolves; no orphans copied
    val orphanDatums = dst.table("binary_data")
      .join(dst.table("inputs").where(col("datum_info").isNotNull)
        .select(col("datum_info.hash").as("binary_data_hash")),
        Seq("binary_data_hash"), "left_anti").count()
    assert(orphanDatums == 0)
    assert(dst.table("checkpoints").count() == src.table("checkpoints").count())
    assert(Indexer.getPatterns(dst) == Set(p))
    // the copy answers queries identically to filtering the source
    val q = Api.MatchesQuery(s"*/$delCred", order = Api.SortDirection.Asc)
    val a = FoldInputs(dst, q).select("transaction_id", "output_index").collect()
    val b = FoldInputs(src, q).select("transaction_id", "output_index").collect()
    assert(a.sameElements(b))
  }

  test("F8: asJson emits kupo-shaped rows; quantities stringify on demand") {
    val ix = new GraftIndex(spark, tmpDir("graft-json"))
    Indexer.ingest(ix, blocksDf, Set[Pattern](Pattern.MatchAny(true)))
    val res = FoldInputs(ix, Api.MatchesQuery("*", order = Api.SortDirection.Asc))

    val js = FoldInputs.asJson(res).select("result_json").collect().map(_.getString(0))
    assert(js.nonEmpty)
    assert(js.forall(_.contains("\"transaction_id\"")))
    assert(js.forall(_.contains("\"created_at\":{\"slot_no\"")))
    // an asset row flattens to a dotted policy.asset key with numeric qty
    val withAsset = js.find(_.contains("\"assets\"")).get
    assert(withAsset.matches(""".*"assets":\{"[0-9a-f]{56}\.[0-9a-f]+":\d+.*"""))

    val jsStr = FoldInputs.asJson(res, stringQuantities = true)
      .select("result_json").collect().map(_.getString(0))
    val withAssetStr = jsStr.find(_.contains("\"assets\"")).get
    assert(withAssetStr.matches(""".*"assets":\{"[0-9a-f]{56}\.[0-9a-f]+":"\d+".*"""))
    assert(jsStr.forall(_.matches(""".*"coins":"\d+".*""")))
  }
}
