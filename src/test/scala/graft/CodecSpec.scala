package graft

import graft.codec.{Base58, Bech32, Blake2b, Hex}
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  test("hex round-trips") {
    val rnd = new scala.util.Random(42)
    (0 to 200).foreach { n =>
      val arr = new Array[Byte](n)
      rnd.nextBytes(arr)
      assert(Hex.decode(Hex.encode(arr)).map(_.toSeq).contains(arr.toSeq))
    }
  }

  test("hex rejects bad input") {
    assert(Hex.decode("0").isEmpty)
    assert(Hex.decode("zz").isEmpty)
  }

  test("blake2b-512 RFC 7693 appendix A vector") {
    assert(Hex.encode(Blake2b.hash(64, "abc".getBytes)) ==
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
      "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
  }

  test("blake2b-256 empty input") {
    assert(Hex.encode(Blake2b.hash256(Array.empty)) ==
      "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8")
  }

  test("blake2b-224 hashes a verification key into the reference credential") {
    // golden pair from /root/reference/test/Test/Kupo/Data/Pattern/Fixture.hs
    val vk = Hex.decode("379bd7fd5493ebb21e199526b1a1b389ddb85cd70fccd4ca169bfdc4f59042ec").get
    assert(Hex.encode(Blake2b.hash224(vk)) ==
      "adec17c2784d97ed403c011ab73aa32bdf74ee10ce44258bf72c256b")
  }

  test("blake2b handles multi-block inputs (>128 bytes)") {
    // sanity across the block boundary: 100..300 byte inputs hash without error
    // and differ from each other
    val hashes = (100 to 300 by 7).map { n =>
      Hex.encode(Blake2b.hash256(Array.fill(n)(0x41.toByte)))
    }
    assert(hashes.distinct.size == hashes.size)
    // 129 zero bytes — exercises the "last block is full" path
    assert(Blake2b.hash256(new Array[Byte](129)).length == 32)
  }

  test("bech32 decodes BIP-173 valid vectors") {
    assert(Bech32.decode("A12UEL5L").map { case (h, d) => (h, d.toSeq) }
      .contains(("a", Seq.empty[Byte])))
    val Some((hrp, data)) = Bech32.decode("abcdef1qpzry9x8gf2tvdw0s3jn54khce6mua7lmqqqxw")
    assert(hrp == "abcdef")
    assert(Hex.encode(data) == "00443214c74254b635cf84653a56d7c675be77df")
  }

  test("bech32 rejects invalid strings") {
    assert(Bech32.decode("A12UEL5X").isEmpty)          // bad checksum
    assert(Bech32.decode("abc1DEF1qqqqq").isEmpty)     // mixed case
    assert(Bech32.decode("1qqqqqq").isEmpty)           // empty hrp
    assert(Bech32.decode("pzry9x0s0muk").isEmpty)      // no separator
  }

  test("bech32 decodes a mainnet cardano address to its on-chain bytes") {
    // pair from /root/reference/test/Test/Kupo/Data/Pattern/Fixture.hs:54-63
    val Some((hrp, bytes)) =
      Bech32.decode("addr1vxk7c97z0pxe0m2q8sq34de65v4a7a8wzr8ygfvt7ukz26c8636cs")
    assert(hrp == "addr")
    assert(Hex.encode(bytes) == "61adec17c2784d97ed403c011ab73aa32bdf74ee10ce44258bf72c256b")
  }

  test("base58 decodes a Byron address to CBOR bytes") {
    // Fixture.hs: Ae2tdPwUPEZ… == base16 82d818…
    val Some(bytes) = Base58.decode("Ae2tdPwUPEZChsngv7kdy8pPWJrKSaZwYGMbAtVsSCVppWKfuHwxw3R7fd5")
    assert(Hex.encode(bytes) ==
      "82d818582183581c9f55ecc68118931f27652f39f44c1d583cc9b002405b84465221800ba0001a71a18634")
  }

  test("base58 preserves leading zeros and rejects bad chars") {
    assert(Base58.decode("11").map(_.toSeq).contains(Seq[Byte](0, 0)))
    assert(Base58.decode("0O").isEmpty)
  }
}
