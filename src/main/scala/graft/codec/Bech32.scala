package graft.codec

/** Bech32 (BIP-173) decoder, equivalent to the reference's use of
  * Codec.Binary.Bech32.decodeLenient (/root/reference/src/Kupo/Data/Pattern.hs:370-381):
  * case-insensitive, no 90-char length cap, classic bech32 checksum constant. */
object Bech32 {
  private val charset = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
  private val gen = Array(0x3b6a57b2, 0x26508e6d, 0x1ea119fa, 0x3d4233dd, 0x2a1462b3)

  private def polymod(values: Seq[Int]): Int = {
    var chk = 1
    values.foreach { v =>
      val b = chk >>> 25
      chk = ((chk & 0x1ffffff) << 5) ^ v
      var i = 0
      while (i < 5) { if (((b >>> i) & 1) == 1) chk ^= gen(i); i += 1 }
    }
    chk
  }

  private def hrpExpand(hrp: String): Seq[Int] =
    hrp.map(_.toInt >>> 5) ++ Seq(0) ++ hrp.map(_.toInt & 31)

  /** Returns (hrp, payload bytes) on success. */
  def decode(input: String): Option[(String, Array[Byte])] = {
    val hasLower = input.exists(c => c >= 'a' && c <= 'z')
    val hasUpper = input.exists(c => c >= 'A' && c <= 'Z')
    if (hasLower && hasUpper) return None
    val s = input.toLowerCase
    val pos = s.lastIndexOf('1')
    if (pos < 1 || pos + 7 > s.length) return None
    val hrp = s.substring(0, pos)
    if (hrp.exists(c => c < 33 || c > 126)) return None
    val dataPart = s.substring(pos + 1)
    val data = dataPart.map(charset.indexOf(_))
    if (data.contains(-1)) return None
    if (polymod(hrpExpand(hrp) ++ data) != 1) return None
    fiveToEight(data.dropRight(6)).map(hrp -> _)
  }

  /** Inverse of decode: (hrp, bytes) → bech32 text (used by tests and by
    * emitters that need the wire form; same no-length-cap dialect). */
  def encode(hrp: String, bytes: Array[Byte]): String = {
    val data = eightToFive(bytes)
    val checksum = {
      val values = hrpExpand(hrp) ++ data ++ Seq(0, 0, 0, 0, 0, 0)
      val mod = polymod(values) ^ 1
      (0 until 6).map(i => (mod >>> (5 * (5 - i))) & 31)
    }
    hrp + "1" + (data ++ checksum).map(charset(_)).mkString
  }

  private def eightToFive(bytes: Array[Byte]): Seq[Int] = {
    var acc = 0; var bits = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    bytes.foreach { b =>
      acc = (acc << 8) | (b & 0xff); bits += 8
      while (bits >= 5) { bits -= 5; out += ((acc >>> bits) & 31) }
    }
    if (bits > 0) out += ((acc << (5 - bits)) & 31)
    out.toSeq
  }

  /** 5-bit groups → bytes, rejecting bad padding (BIP-173 convertbits(5,8,false)). */
  private def fiveToEight(data: Seq[Int]): Option[Array[Byte]] = {
    var acc = 0; var bits = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    data.foreach { v =>
      acc = (acc << 5) | v; bits += 5
      while (bits >= 8) { bits -= 8; out += ((acc >>> bits) & 0xff).toByte }
    }
    if (bits >= 5 || ((acc << (8 - bits)) & 0xff) != 0) None
    else Some(out.toArray)
  }
}
