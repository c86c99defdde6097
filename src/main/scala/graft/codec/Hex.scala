package graft.codec

/** Base16 codec (lowercase), matching the reference's encodeBase16/decodeBase16
  * (/root/reference/src/Kupo/Data/Database.hs:571,606 usage sites). */
object Hex {
  private val digits = "0123456789abcdef".toCharArray

  def encode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(digits(b >>> 4)).append(digits(b & 0x0f))
      i += 1
    }
    sb.toString
  }

  def decode(s: String): Option[Array[Byte]] = {
    if (s.length % 2 != 0) return None
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(s.charAt(2 * i), 16)
      val lo = Character.digit(s.charAt(2 * i + 1), 16)
      if (hi < 0 || lo < 0) return None
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    Some(out)
  }
}
