package graft.codec

/** Minimal CBOR (RFC 8949) reader with byte-span tracking.
  *
  * The span matters: Cardano derives identities by hashing the EXACT wire
  * bytes of sub-items — a transaction id is blake2b-256 of the body item's
  * bytes, a datum hash is blake2b-256 of the plutus-data item's bytes — so
  * the decoder must be able to hand back the original slice for any item
  * (the reference uses annotated decoders for the same reason,
  * `decodeCborAnn` in /root/reference/src/Kupo/Data/Hydra.hs:184-187).
  *
  * Scope: everything Cardano's block/tx CDDL uses — all major types,
  * definite and indefinite lengths, tags (incl. 258 set and 24
  * encoded-CBOR), half/single/double floats (parsed, not interpreted).
  * Not a general-purpose validator: duplicate map keys and non-canonical
  * lengths are accepted as-is. */
object Cbor {

  sealed trait Item { def start: Int; def end: Int }
  final case class CInt(value: BigInt, start: Int, end: Int) extends Item
  final case class CBytes(bytes: Array[Byte], start: Int, end: Int) extends Item
  final case class CText(text: String, start: Int, end: Int) extends Item
  final case class CArr(items: Vector[Item], start: Int, end: Int) extends Item
  final case class CMap(entries: Vector[(Item, Item)], start: Int, end: Int) extends Item
  final case class CTag(tag: Long, inner: Item, start: Int, end: Int) extends Item
  /** false (20), true (21), null (22), undefined (23), other simples. */
  final case class CSimple(value: Int, start: Int, end: Int) extends Item
  final case class CFloat(value: Double, start: Int, end: Int) extends Item

  /** Decode exactly one item covering the whole input. */
  def decode(bytes: Array[Byte]): Item = {
    val r = new Reader(bytes)
    val item = r.readItem()
    require(r.position == bytes.length,
      s"trailing bytes after CBOR item: ${bytes.length - r.position}")
    item
  }

  def decodeHex(hex: String): Item =
    decode(Hex.decode(hex).getOrElse(sys.error("invalid hex")))

  /** The original wire bytes of an item (for identity hashing). */
  def slice(bytes: Array[Byte], item: Item): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, item.start, item.end)

  // ---- encoder (the write side, for protocol messages) ----

  /** Span-free constructors for items built in memory (spans only matter
    * on DECODED items, where they index the original wire bytes). */
  def cInt(v: BigInt): CInt = CInt(v, 0, 0)
  def cBytes(b: Array[Byte]): CBytes = CBytes(b, 0, 0)
  def cText(t: String): CText = CText(t, 0, 0)
  def cArr(items: Item*): CArr = CArr(items.toVector, 0, 0)
  def cMap(entries: (Item, Item)*): CMap = CMap(entries.toVector, 0, 0)
  def cTag(tag: Long, inner: Item): CTag = CTag(tag, inner, 0, 0)
  def cBool(b: Boolean): CSimple = CSimple(if (b) 21 else 20, 0, 0)

  /** Canonical encoding: definite lengths, shortest-form heads (RFC 8949
    * §4.2.1) — what the Ouroboros mini-protocol codecs emit. Floats are
    * written as doubles (the protocol messages this serves carry none). */
  def encode(item: Item): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    write(out, item)
    out.toByteArray
  }

  private def writeHead(out: java.io.ByteArrayOutputStream, major: Int, v: BigInt): Unit = {
    require(v >= 0 && v.bitLength <= 64, s"CBOR head out of range: $v")
    val mt = major << 5
    if (v < 24) out.write(mt | v.toInt)
    else {
      val n = if (v.bitLength <= 8) 1 else if (v.bitLength <= 16) 2
              else if (v.bitLength <= 32) 4 else 8
      out.write(mt | (n match { case 1 => 24; case 2 => 25; case 4 => 26; case 8 => 27 }))
      var i = n - 1
      while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
  }

  private def write(out: java.io.ByteArrayOutputStream, item: Item): Unit = item match {
    case CInt(v, _, _) =>
      if (v >= 0) writeHead(out, 0, v) else writeHead(out, 1, -(v + 1))
    case CBytes(b, _, _) =>
      writeHead(out, 2, BigInt(b.length)); out.write(b, 0, b.length)
    case CText(t, _, _) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      writeHead(out, 3, BigInt(b.length)); out.write(b, 0, b.length)
    case CArr(items, _, _) =>
      writeHead(out, 4, BigInt(items.length)); items.foreach(write(out, _))
    case CMap(entries, _, _) =>
      writeHead(out, 5, BigInt(entries.length))
      entries.foreach { case (k, v) => write(out, k); write(out, v) }
    case CTag(t, inner, _, _) =>
      writeHead(out, 6, BigInt(t)); write(out, inner)
    case CSimple(v, _, _) =>
      require(v >= 0 && v <= 255 && (v < 24 || v > 31), s"unencodable simple: $v")
      if (v < 24) out.write(0xe0 | v) else { out.write(0xf8); out.write(v) }
    case CFloat(d, _, _) =>
      out.write(0xfb)
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 7
      while (i >= 0) { out.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  /** Decode ONE item from a prefix of `bytes` starting at `offset`:
    * `Some((item, nextOffset))`, or None when the buffer holds only an
    * incomplete item (more input needed) — the incremental-framing entry
    * point for stream transports. Malformed input still fails loudly. */
  def decodePrefix(bytes: Array[Byte], offset: Int = 0): Option[(Item, Int)] = {
    if (offset >= bytes.length) return None
    val r = new Reader(bytes)
    r.seek(offset)
    try Some((r.readItem(), r.position))
    catch {
      case e: IllegalArgumentException
        if e.getMessage != null && (e.getMessage.contains("end of CBOR input") ||
          e.getMessage.contains("length past end")) => None
    }
  }

  final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def position: Int = pos
    private[Cbor] def seek(p: Int): Unit = { require(p >= 0 && p <= bytes.length); pos = p }

    private def u8(): Int = {
      require(pos < bytes.length, "unexpected end of CBOR input")
      val b = bytes(pos) & 0xff; pos += 1; b
    }

    private def uint(n: Int): BigInt = {
      var acc = BigInt(0)
      var i = 0
      while (i < n) { acc = (acc << 8) | BigInt(u8()); i += 1 }
      acc
    }

    /** (additional-info value, isIndefinite) for the given initial byte. */
    private def arg(info: Int): Option[BigInt] = info match {
      case n if n < 24 => Some(BigInt(n))
      case 24          => Some(uint(1))
      case 25          => Some(uint(2))
      case 26          => Some(uint(4))
      case 27          => Some(uint(8))
      case 31          => None // indefinite
      case other       => sys.error(s"reserved CBOR additional info: $other")
    }

    private def take(n: Int): Array[Byte] = {
      require(pos + n <= bytes.length, "CBOR length past end of input")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }

    private def defLen(a: Option[BigInt]): Int = {
      val v = a.getOrElse(sys.error("indefinite length where definite required"))
      require(v.isValidInt, s"unreasonable CBOR length: $v")
      v.toInt
    }

    def readItem(): Item = {
      val start = pos
      val ib = u8()
      val major = ib >> 5
      val info = ib & 0x1f
      major match {
        case 0 => CInt(arg(info).get, start, pos)
        case 1 => CInt(BigInt(-1) - arg(info).get, start, pos)
        case 2 =>
          arg(info) match {
            case a @ Some(_) => CBytes(take(defLen(a)), start, pos)
            case None => // indefinite: chunks until break
              val buf = new java.io.ByteArrayOutputStream()
              while (peek() != 0xff) {
                readItem() match {
                  case CBytes(chunk, _, _) => buf.write(chunk)
                  case other => sys.error(s"non-bytes chunk in indefinite bytes: $other")
                }
              }
              pos += 1 // break
              CBytes(buf.toByteArray, start, pos)
          }
        case 3 =>
          arg(info) match {
            case a @ Some(_) =>
              CText(new String(take(defLen(a)), java.nio.charset.StandardCharsets.UTF_8),
                start, pos)
            case None =>
              val sb = new StringBuilder
              while (peek() != 0xff) {
                readItem() match {
                  case CText(chunk, _, _) => sb.append(chunk)
                  case other => sys.error(s"non-text chunk in indefinite text: $other")
                }
              }
              pos += 1
              CText(sb.toString, start, pos)
          }
        case 4 =>
          arg(info) match {
            case Some(n) =>
              require(n.isValidInt, "unreasonable array length")
              val items = Vector.fill(n.toInt)(readItem())
              CArr(items, start, pos)
            case None =>
              val b = Vector.newBuilder[Item]
              while (peek() != 0xff) b += readItem()
              pos += 1
              CArr(b.result(), start, pos)
          }
        case 5 =>
          arg(info) match {
            case Some(n) =>
              require(n.isValidInt, "unreasonable map length")
              val entries = Vector.fill(n.toInt)((readItem(), readItem()))
              CMap(entries, start, pos)
            case None =>
              val b = Vector.newBuilder[(Item, Item)]
              while (peek() != 0xff) b += ((readItem(), readItem()))
              pos += 1
              CMap(b.result(), start, pos)
          }
        case 6 =>
          val t = arg(info).get
          require(t.isValidLong, "unreasonable tag")
          CTag(t.toLong, readItem(), start, pos)
        case 7 =>
          info match {
            case n if n < 24 => CSimple(n, start, pos)
            case 24          => CSimple(u8(), start, pos)
            case 25          => CFloat(halfToDouble(uint(2).toInt), start, pos)
            case 26          => CFloat(java.lang.Float.intBitsToFloat(uint(4).toInt).toDouble, start, pos)
            case 27          => CFloat(java.lang.Double.longBitsToDouble(uint(8).toLong), start, pos)
            case other       => sys.error(s"reserved simple value form: $other")
          }
      }
    }

    private def peek(): Int = {
      require(pos < bytes.length, "unexpected end of CBOR input")
      bytes(pos) & 0xff
    }

    private def halfToDouble(h: Int): Double = {
      val exp = (h >> 10) & 0x1f
      val mant = h & 0x3ff
      val sign = if ((h & 0x8000) != 0) -1.0 else 1.0
      val v =
        if (exp == 0) mant * math.pow(2, -24)
        else if (exp != 31) (mant + 1024) * math.pow(2, exp - 25)
        else if (mant == 0) Double.PositiveInfinity
        else Double.NaN
      sign * v
    }
  }
}
