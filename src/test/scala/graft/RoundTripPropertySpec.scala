package graft

import graft.codec.Hex
import graft.index.GraftIndex.{Manifest, Segment, SpentStat}
import graft.model.{Address, Pattern}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property round-trips, porting the reference's toRow↔fromRow /
  * patternToText↔patternFromText properties
  * (/root/reference/test/Test/Kupo/Data/DatabaseSpec.hs:199-213,
  * CardanoSpec.hs) onto the engine's codecs. Deterministic seeded sampling
  * (the scalatest/scalacheck bridge is not in the offline cache). */
class RoundTripPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 300)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      check(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 300)(check: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      check(ga.pureApply(Gen.Parameters.default, Seed(42L + i)),
        gb.pureApply(Gen.Parameters.default, Seed(9042L + i)))
    }

  private val genCredHex: Gen[String] =
    Gen.listOfN(28, Gen.choose(0, 255)).map(_.map(b => f"$b%02x").mkString)
  private val genTxIdHex: Gen[String] =
    Gen.listOfN(32, Gen.choose(0, 255)).map(_.map(b => f"$b%02x").mkString)
  private val genNetwork: Gen[Int] = Gen.oneOf(0, 1)

  /** On-chain CIP-19 address bytes: base (types 0-3), pointer (4-5),
    * enterprise (6-7). */
  private val genOnChain: Gen[Array[Byte]] = for {
    net <- genNetwork
    t <- Gen.choose(0, 7)
    pay <- genCredHex
    rest <- t match {
      case b if b <= 3 => genCredHex // base: delegation credential
      case p if p <= 5 => // pointer: 3 short varlen naturals
        Gen.listOfN(3, Gen.choose(0, 127)).map(_.map(n => f"$n%02x").mkString)
      case _ => Gen.const("") // enterprise
    }
  } yield Hex.decode(f"${(t << 4) | net}%02x" + pay + rest).get

  test("address: on-chain bytes round-trip through the kupo form") {
    forAll(genOnChain) { bytes =>
      val kupo = Address.fromOnChainBytes(bytes)
      assert(kupo.nonEmpty)
      val back = kupo.flatMap(Address.toOnChainBytes)
      assert(back.map(_.toSeq).contains(bytes.toSeq))
      // payment credential is always the last 28 bytes of the kupo form
      val payHex = Hex.encode(bytes.slice(1, 29))
      assert(Address.paymentPartHex(kupo.get).contains(payHex))
    }
  }

  private val genPattern: Gen[Pattern] = Gen.oneOf(
    Gen.const(Pattern.MatchAny(includingBootstrap = true)),
    Gen.const(Pattern.MatchAny(includingBootstrap = false)),
    genOnChain.map(b => Pattern.MatchExact(Address.fromOnChainBytes(b).get)),
    genCredHex.map(Pattern.MatchPayment(_)),
    genCredHex.map(Pattern.MatchDelegation(_)),
    Gen.zip(genCredHex, genCredHex).map { case (p, d) => Pattern.MatchPaymentAndDelegation(p, d) },
    genTxIdHex.map(Pattern.MatchTransactionId(_)),
    Gen.zip(genTxIdHex, Gen.choose(0, 0xffff)).map { case (t, i) => Pattern.MatchOutputReference(t, i) },
    genCredHex.map(Pattern.MatchPolicyId(_)),
    Gen.zip(genCredHex, Gen.choose(0, 32).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255)).map(_.map(b => f"$b%02x").mkString)))
      .map { case (p, a) => Pattern.MatchAssetId(p, a) },
    Gen.choose(0L, Long.MaxValue).map(Pattern.MatchMetadataTag(_))
  )

  test("pattern: toText round-trips through fromText") {
    forAll(genPattern) { p =>
      assert(Pattern.fromText(p.toText).contains(p), s"for ${p.toText}")
    }
  }

  test("pattern: includes implies overlaps (generated pairs)") {
    forAll2(genPattern, genPattern) { (x, y) =>
      if (x.includes(y)) assert(x.overlaps(Set(y)))
    }
  }

  private val genSpent: Gen[SpentStat] = Gen.oneOf(
    Gen.const(SpentStat.Unknown), Gen.const(SpentStat.NoneSpent),
    Gen.choose(0L, 1L << 40).map(SpentStat.MaxAt(_)))
  private val genSegment: Gen[Segment] = for {
    id <- Gen.choose(0, 999999)
    stats <- Gen.option(Gen.zip(Gen.choose(0L, 1L << 40), Gen.choose(0L, 1L << 40)))
    spent <- genSpent
    rows <- Gen.option(Gen.choose(0L, 1L << 50))
  } yield Segment(f"inputs/seg-$id%06d", stats.map(s => math.min(s._1, s._2)),
    stats.map(s => math.max(s._1, s._2)), spent, rows)

  test("manifest: JSON round-trips segments, stats, and spent stats") {
    val genManifest = for {
      v <- Gen.choose(0L, 1000000L)
      tables <- Gen.mapOf(Gen.zip(
        Gen.oneOf("inputs", "spends", "checkpoints", "binary_data"),
        Gen.listOf(genSegment)))
    } yield Manifest(v, tables)
    forAll(genManifest, n = 100) { m =>
      val dirPath = java.nio.file.Files.createTempDirectory("graft-manifest-prop")
      SparkSpec.cleanupAtExit(dirPath) // 100 dirs per run must not pile up in /tmp
      val dir = dirPath.toString
      Manifest.write(dir, m)
      assert(Manifest.read(dir).contains(m))
    }
  }
}
