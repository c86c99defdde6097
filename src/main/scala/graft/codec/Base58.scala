package graft.codec

/** Base58 (Bitcoin alphabet) decoder for Byron addresses, equivalent to the
  * reference's decodeBase58 (/root/reference/src/Kupo/Data/Pattern.hs:374-376). */
object Base58 {
  private val alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val indexes: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def decode(s: String): Option[Array[Byte]] = {
    if (s.isEmpty) return Some(Array.empty)
    if (s.exists(c => c >= 128 || indexes(c.toInt) < 0)) return None
    // big-integer base conversion, preserving leading zeros ('1' chars)
    val zeros = s.takeWhile(_ == '1').length
    var acc = java.math.BigInteger.ZERO
    val base = java.math.BigInteger.valueOf(58)
    s.foreach(c => acc = acc.multiply(base).add(java.math.BigInteger.valueOf(indexes(c.toInt).toLong)))
    val raw = acc.toByteArray.dropWhile(_ == 0)
    Some(Array.fill[Byte](zeros)(0) ++ raw)
  }
}
