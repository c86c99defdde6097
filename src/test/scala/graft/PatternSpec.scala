package graft

import graft.codec.Hex
import graft.model.{Address, Pattern}
import graft.model.Pattern._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's pattern matrix
  * (/root/reference/test/Test/Kupo/Data/Pattern/Fixture.hs and
  * test/Test/Kupo/Data/PatternSpec.hs:49-95): fixed addresses covering
  * enterprise key/script, base key/script combinations and Byron, a table of
  * (text, expected parse, expected address matches), plus the includes/overlaps
  * laws. */
class PatternSpec extends AnyFunSuite {

  // on-chain address bytes from Fixture.hs, re-serialized to kupo hex form
  private val onChain = Seq(
    "61adec17c2784d97ed403c011ab73aa32bdf74ee10ce44258bf72c256b",           // 0: enterprise, key cred0
    "71c37b1b5dc0669f1d3c61a6fddb2e8fde96be87b881c60bce8e8d542f",           // 1: enterprise, script cred1
    "21adec17c2784d97ed403c011ab73aa32bdf74ee10ce44258bf72c256bc37b1b5dc0669f1d3c61a6fddb2e8fde96be87b881c60bce8e8d542f", // 2: base, pay cred0 / del cred1 (script)
    "01337b62cfff6403a06a3acbc34f8c46003c69fe79a3628cefa9c47251adec17c2784d97ed403c011ab73aa32bdf74ee10ce44258bf72c256b", // 3: base, pay cred2 / del cred0
    "82d818582183581c9f55ecc68118931f27652f39f44c1d583cc9b002405b84465221800ba0001a71a18634" // 4: byron
  )
  private val addrs: Seq[String] =
    onChain.map(h => Address.fromOnChainBytes(Hex.decode(h).get).get)

  private val cred0 = "adec17c2784d97ed403c011ab73aa32bdf74ee10ce44258bf72c256b"
  private val cred1 = "c37b1b5dc0669f1d3c61a6fddb2e8fde96be87b881c60bce8e8d542f"
  private val cred2 = "337b62cfff6403a06a3acbc34f8c46003c69fe79a3628cefa9c47251"
  private val tx0 = "edb10ce4425897ed403c011ab73aa32bdf74ebf72c256bc37b121adec17c2784"
  private val tx1 = "97ed403c011ab73aa32bdf74ee10ce44258bf72c256bc37b121adec17c2784db"
  private val pol0 = "3c011ab73aa32bdf74ebf72c256bc37b121adeedb10ce4425897ed40"
  private val pol1 = "2bdf74ee10ce44258bf72c256bc37b121adec197ed403c011ab73aa3"

  test("kupo address re-serialization puts the delegation part first") {
    assert(addrs(0) == "03" + "61" + cred0)
    assert(addrs(1) == "03" + "71" + cred1)
    assert(addrs(2) == "01" + cred1 + "21" + cred0)
    assert(addrs(3) == "01" + cred0 + "01" +
      "337b62cfff6403a06a3acbc34f8c46003c69fe79a3628cefa9c47251")
    assert(addrs(4) == "00" + onChain(4))
  }

  // The fixture matrix: (pattern text, expected Pattern, indices of matching
  // addrs) — a 1:1 sweep of the reference's `patterns` table
  // (Fixture.hs:41-148, 18 rows in source order; rows whose expected matches
  // are constraint-GENERATED outputs rather than fixture addresses — output
  // refs, tx ids, policies — carry an empty address set here and get their
  // match semantics from IndexSpec/ApiSurfaceSpec instead).
  private val matrix: Seq[(String, Pattern, Set[Int])] = Seq(
    ("*", MatchAny(true), Set(0, 1, 2, 3, 4)),                          // row 1
    ("*/*", MatchAny(false), Set(0, 1, 2, 3)),                          // row 2
    ("addr1vxk7c97z0pxe0m2q8sq34de65v4a7a8wzr8ygfvt7ukz26c8636cs",
      MatchExact(addrs(0)), Set(0)),                                    // row 3
    ("61adec17c2784d97ed403c011ab73aa32bdf74ee10ce44258bf72c256b",
      MatchExact(addrs(0)), Set(0)),                                    // row 4
    ("Ae2tdPwUPEZChsngv7kdy8pPWJrKSaZwYGMbAtVsSCVppWKfuHwxw3R7fd5",
      MatchExact(addrs(4)), Set(4)),                                    // row 5
    ("379bd7fd5493ebb21e199526b1a1b389ddb85cd70fccd4ca169bfdc4f59042ec/*",
      MatchPayment(cred0), Set(0, 2)),                                  // row 6
    ("addr_vk1x7da0l25j04my8sej5ntrgdn38wmshxhplxdfjskn07ufavsgtkqn5hljl/*",
      MatchPayment(cred0), Set(0, 2)),                                  // row 7
    (s"$cred0/*", MatchPayment(cred0), Set(0, 2)),                      // row 8
    ("*/379bd7fd5493ebb21e199526b1a1b389ddb85cd70fccd4ca169bfdc4f59042ec",
      MatchDelegation(cred0), Set(3)),                                  // row 9
    ("*/stake_vkh14hkp0sncfkt76spuqydtww4r900hfmsseezztzlh9sjkkjx6d7q",
      MatchDelegation(cred0), Set(3)),                                  // row 10
    ("addr_vkh14hkp0sncfkt76spuqydtww4r900hfmsseezztzlh9sjkkvjxtmr/" +
      "script1cda3khwqv60360rp5m7akt50m6ttapacs8rqhn5w342z7r35m37",
      MatchPaymentAndDelegation(cred0, cred1), Set(2)),                 // row 11
    ("stake1uyehkck0lajq8gr28t9uxnuvgcqrc6070x3k9r8048z8y5gh6ffgw",
      MatchDelegation(cred2), Set.empty),                               // row 12
    ("script1cda3khwqv60360rp5m7akt50m6ttapacs8rqhn5w342z7r35m37/*",
      MatchPayment(cred1), Set(1)),                                     // row 13
    (s"14@$tx0", MatchOutputReference(tx0, 14), Set.empty),             // row 14
    (s"42@$tx0", MatchOutputReference(tx0, 42), Set.empty),             // row 15
    (s"*@$tx1", MatchTransactionId(tx1), Set.empty),                    // row 16
    (s"$pol0.*", MatchPolicyId(pol0), Set.empty),                       // row 17
    (s"$pol1.*", MatchPolicyId(pol1), Set.empty)                        // row 18
  )

  test("pattern matrix: text parses to the expected pattern") {
    matrix.foreach { case (text, expected, _) =>
      assert(Pattern.fromText(text).contains(expected), s"for: $text")
    }
  }

  test("pattern matrix: address matching") {
    matrix.foreach { case (text, p, expectedIdx) =>
      if (!p.isInstanceOf[MatchTransactionId] && !p.isInstanceOf[MatchOutputReference]
          && !p.isInstanceOf[MatchPolicyId]) {
        val got = addrs.indices.filter(i => p.matchesAddress(addrs(i))).toSet
        assert(got == expectedIdx, s"for: $text")
      }
    }
  }

  test("toText round-trips through fromText") {
    matrix.map(_._2).distinct.foreach { p =>
      assert(Pattern.fromText(p.toText).contains(p), s"for: $p")
    }
    val extras = Seq(
      MatchAssetId(pol0, "abcd"),
      MatchMetadataTag(674L),
      MatchOutputReference(tx0, 0))
    extras.foreach(p => assert(Pattern.fromText(p.toText).contains(p)))
  }

  test("stake bech32 parses as delegation pattern") {
    val Some(p) = Pattern.fromText("stake1uyehkck0lajq8gr28t9uxnuvgcqrc6070x3k9r8048z8y5gh6ffgw")
    assert(p.isInstanceOf[MatchDelegation])
  }

  test("byron base58 requires the CBOR envelope and a matching CRC") {
    val valid = "Ae2tdPwUPEZChsngv7kdy8pPWJrKSaZwYGMbAtVsSCVppWKfuHwxw3R7fd5"
    assert(Pattern.fromText(valid).exists(_.isInstanceOf[MatchExact]))
    // flip the last character: decodes to different bytes, CRC no longer holds
    val corrupted = valid.dropRight(1) + (if (valid.last == '5') '6' else '5')
    assert(Pattern.fromText(corrupted).isEmpty)
    // first byte looks CBOR-ish but the envelope is not a Byron address
    assert(!Address.isValidByron(Array(0x82, 0x00, 0x01, 0x02).map(_.toByte)))
    // well-formed envelope, wrong checksum
    assert(!Address.isValidByron(Hex.decode("82d8185821" + "00" * 33 + "1a00000000").get))
  }

  test("invalid patterns are rejected") {
    Seq("", "not-a-pattern", "zz/*", "*/zz", "@abc", "deadbeef.*", "{abc}", "{-1}",
        "1@deadbeef", "*/", "/*").foreach { t =>
      assert(Pattern.fromText(t).isEmpty, s"should reject: $t")
    }
  }

  private val allPatterns: Seq[Pattern] = matrix.map(_._2).distinct

  test("includes is reflexive") {
    allPatterns.foreach(p => assert(p.includes(p), s"for: $p"))
  }

  test("includes implies subset of matches (over fixture addresses)") {
    for (x <- allPatterns; y <- allPatterns if x.includes(y)) {
      addrs.foreach { a =>
        if (y.matchesAddress(a)) assert(x.matchesAddress(a), s"$x includes $y but differs on $a")
      }
    }
  }

  test("includes implies overlaps") {
    for (x <- allPatterns; y <- allPatterns if x.includes(y)) {
      assert(x.overlaps(Set(y)) || y.overlaps(Set(x)), s"$x includes $y but no overlap")
    }
  }

  test("MatchAny includes everything; OnlyShelley excludes IncludingBootstrap") {
    allPatterns.foreach(p => assert(MatchAny(true).includes(p)))
    assert(!MatchAny(false).includes(MatchAny(true)))
    assert(MatchAny(false).includes(MatchPayment(cred0)))
  }

  test("policy includes asset of same policy") {
    assert(MatchPolicyId(pol0).includes(MatchAssetId(pol0, "abcd")))
    assert(!MatchAssetId(pol0, "abcd").includes(MatchPolicyId(pol0)))
    // reference defines this direction (Pattern.hs:205-206): an output-ref
    // pattern "includes" the tx-id pattern of its own transaction
    assert(MatchOutputReference(tx0, 14).includes(MatchTransactionId(tx0)))
    assert(!MatchTransactionId(tx0).includes(MatchOutputReference(tx0, 14)))
  }
}
