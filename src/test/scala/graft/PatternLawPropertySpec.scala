package graft

import graft.model.{Address, Pattern}
import graft.codec.Hex
import org.apache.spark.sql.functions._

/** Pattern-algebra LAW properties over a generated pattern universe — the
  * rebuild of the reference's QuickCheck props
  * (/root/reference/test/Test/Kupo/Data/PatternSpec.hs:63-95):
  *   includes is reflexive; includes is antisymmetric;
  *   p1 includes p2 ⇒ p1 overlaps {p2};
  *   p1 includes p2 ⇒ matches(p2) ⊆ matches(p1).
  * The reference samples from its fixture list; here the universe is BUILT
  * from seeded random component pools (credentials, tx ids, policies,
  * addresses in every CIP-19 shape) and the laws run EXHAUSTIVELY over all
  * pattern pairs. The matches-subset law evaluates `toPredicate` — the
  * compiled Catalyst predicates — against a corpus DataFrame, so it
  * cross-validates the in-memory partial order against what the engine
  * actually scans with.
  *
  * Corpus note: the reference's `includes` deems MatchOutputReference(t,i)
  * to include MatchTransactionId(t) (Pattern.hs:203-204, mirrored here);
  * the subset law therefore requires tx ids carrying an output-reference
  * pattern to have a single corpus output, which is also true of the
  * reference's own fixture list. */
class PatternLawPropertySpec extends SparkSpec {
  import Pattern._

  private def hexOf(seed: Int, bytes: Int): String = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bytes)(f"${rnd.nextInt(256)}%02x").mkString
  }

  // seeded component pools — small enough that includes-pairs actually occur
  private val creds    = (1 to 3).map(i => hexOf(i, 28))
  private val txidA    = hexOf(10, 32) // carries output-reference patterns
  private val txidB    = hexOf(11, 32) // multi-output, txid pattern only
  private val policies = (20 to 21).map(i => hexOf(i, 28))
  private val assets   = Seq("", hexOf(30, 8))
  private val mtags    = Seq(674L, 721L)

  /** kupo-hex addresses through the real CIP-19 codec, every shape: base
    * (payment ‖ delegation), enterprise, pointer, bootstrap. */
  private def onChain(headerHex: String, bodyHex: String): String =
    Address.fromOnChainBytes(Hex.decode(headerHex + bodyHex).get).get
  private val baseAddrs = for (p <- creds.take(2); d <- creds.take(2))
    yield onChain("00", p + d)
  private val enterpriseAddr = onChain("60", creds(2))
  private val pointerAddr    = onChain("40", creds(0) + "010203")
  private val bootstrapAddr  = "00" + hexOf(40, 30) // kupo form: 00 ‖ CBOR bytes
  private val addrs = baseAddrs ++ Seq(enterpriseAddr, pointerAddr, bootstrapAddr)

  private val universe: Seq[Pattern] =
    Seq(MatchAny(includingBootstrap = true), MatchAny(includingBootstrap = false)) ++
      addrs.map(MatchExact(_)) ++
      creds.map(MatchPayment(_)) ++
      creds.map(MatchDelegation(_)) ++
      (for (p <- creds; d <- creds) yield MatchPaymentAndDelegation(p, d)) ++
      Seq(MatchTransactionId(txidA), MatchTransactionId(txidB)) ++
      Seq(0, 1).map(MatchOutputReference(txidA, _)) ++
      policies.map(MatchPolicyId(_)) ++
      (for (p <- policies; a <- assets) yield MatchAssetId(p, a)) ++
      mtags.map(MatchMetadataTag(_))

  test("includes is reflexive over the generated universe") {
    universe.foreach(p => assert(p.includes(p), s"not reflexive: $p"))
  }

  test("includes is antisymmetric over all generated pairs") {
    for (p1 <- universe; p2 <- universe if p1.includes(p2) && p2.includes(p1))
      assert(p1 == p2, s"mutual includes but distinct: $p1 vs $p2")
  }

  test("includes implies overlaps over all generated pairs") {
    for (p1 <- universe; p2 <- universe if p1.includes(p2))
      assert(p1.overlaps(Set(p2)), s"$p1 includes $p2 but no overlap")
  }

  test("includes implies matches-subset under the compiled Catalyst predicates") {
    // corpus: every address shape × a tx id, plus multi-output txidB rows
    // and policy/asset/metadata carriers — one row per distinct shape.
    // The BOOTSTRAP row carries a txid/asset/tag payload OUTSIDE the
    // pattern pools: the reference's includes deems MatchAny(OnlyShelley)
    // to include every txid/policy/tag pattern, which is only subset-sound
    // when no bootstrap output carries a pattern-referenced id — true of
    // the reference's own fixture list, mirrored here
    val rows = addrs.zipWithIndex.map { case (a, i) =>
      if (a == bootstrapAddr)
        (i.toLong, a, hexOf(50, 32), 0,
          Map.empty[String, Map[String, Long]], Seq.empty[Long])
      else
        // txidA on EXACTLY one row (the outref-carrying tx has one output,
        // as in the reference fixtures); other rows get unpooled txids
        (i.toLong, a, if (i == 0) txidA else hexOf(60 + i, 32), 0,
          Map(policies(i % 2) -> Map(assets(i % 2) -> 1L)), Seq(mtags(i % 2)))
    } ++ Seq(
      (100L, baseAddrs.head, txidB, 0, Map(policies(0) -> Map(assets(1) -> 2L)), Seq(mtags(0))),
      (101L, baseAddrs.last, txidB, 1, Map.empty[String, Map[String, Long]], Seq.empty[Long])
    )
    // txidA rows beyond the first must not collide with the (txidA, 0)
    // output reference — mirror the reference fixture's one-output txs
    import spark.implicits._
    val corpus = rows.toDF("row_id", "address", "tx_id", "output_index", "amap", "metadata_labels")
      .select(col("row_id"), col("address"), col("tx_id"), col("output_index"),
        struct(lit(1L).as("coins"), col("amap").as("assets")).as("value"),
        col("metadata_labels"))
      .cache()
    // the subset law additionally requires output-reference patterns to
    // denote outputs that EXIST (the reference's includes direction
    // OutRef ⊇ TxId is only subset-sound then, and its fixture outrefs all
    // exist); OutRef(txidA, 1) stays in the universe for the in-memory
    // laws above but is excluded here
    val lawUniverse = universe.filterNot(_ == MatchOutputReference(txidA, 1))
    // ONE pass: every pattern's compiled predicate as a column
    val evaluated = corpus.select(
      col("row_id") +: lawUniverse.zipWithIndex.map { case (p, i) =>
        p.toPredicate.as(s"p$i")
      }: _*).collect()
    val matchSet: Map[Int, Set[Long]] = lawUniverse.indices.map { i =>
      i -> evaluated.filter(_.getBoolean(i + 1)).map(_.getLong(0)).toSet
    }.toMap
    var lawPairs = 0
    for ((p1, i1) <- lawUniverse.zipWithIndex; (p2, i2) <- lawUniverse.zipWithIndex
         if p1.includes(p2)) {
      assert(matchSet(i2).subsetOf(matchSet(i1)),
        s"$p1 includes $p2 but matches diverge: ${matchSet(i2)} vs ${matchSet(i1)}")
      lawPairs += 1
    }
    // the law must actually fire across constructors, not only reflexively
    assert(lawPairs > lawUniverse.size + 20, s"too few includes pairs: $lawPairs")
    corpus.unpersist()
  }
}
