package graft.codec

/** BLAKE2b (RFC 7693), unkeyed, variable digest length — used to hash 32-byte
  * verification keys into 28-byte credentials, as the reference does in
  * patternFromText (/root/reference/src/Kupo/Data/Pattern.hs:307-335). */
object Blake2b {
  private val IV = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  def hash(outLen: Int, input: Array[Byte]): Array[Byte] = {
    require(outLen > 0 && outLen <= 64, "digest length must be in [1,64]")
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong

    var t = 0L
    var offset = 0
    val n = input.length
    // all full blocks except the last (the last block, even if full, is final)
    while (n - offset > 128) {
      t += 128
      compress(h, input, offset, t, last = false)
      offset += 128
    }
    val lastLen = n - offset
    val block = new Array[Byte](128)
    System.arraycopy(input, offset, block, 0, lastLen)
    t += lastLen
    compress(h, block, 0, t, last = true)

    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  def hash224(input: Array[Byte]): Array[Byte] = hash(28, input)
  def hash256(input: Array[Byte]): Array[Byte] = hash(32, input)

  @inline private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def compress(h: Array[Long], block: Array[Byte], off: Int, t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t // low word of the 128-bit counter (inputs < 2^64 bytes)
    if (last) v(14) = ~v(14)

    @inline def g(r: Array[Int], a: Int, b: Int, c: Int, d: Int, x: Int, y: Int): Unit = {
      v(a) = v(a) + v(b) + m(r(x)); v(d) = rotr(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d); v(b) = rotr(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + m(r(y)); v(d) = rotr(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d); v(b) = rotr(v(b) ^ v(c), 63)
    }

    var round = 0
    while (round < 12) {
      val s = SIGMA(round % 10)
      g(s, 0, 4, 8, 12, 0, 1); g(s, 1, 5, 9, 13, 2, 3)
      g(s, 2, 6, 10, 14, 4, 5); g(s, 3, 7, 11, 15, 6, 7)
      g(s, 0, 5, 10, 15, 8, 9); g(s, 1, 6, 11, 12, 10, 11)
      g(s, 2, 7, 8, 13, 12, 13); g(s, 3, 4, 9, 14, 14, 15)
      round += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }
}
