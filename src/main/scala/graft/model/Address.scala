package graft.model

import graft.codec.Hex

/** Kupo's canonical address form: lowercase hex of
  * tag(1) ‖ delegation-credentials ‖ header(1) ‖ payment-credentials(28),
  * where tag ∈ {0 byron-cbor, 1 base, 2 pointer, 3 enterprise}. The delegation
  * part is serialized FIRST so delegation lookups are string-prefix predicates
  * (reference design comment /root/reference/src/Kupo/Data/Database.hs:507-567,
  * serializer addressToRow :568-599). The engine stores addresses in this form;
  * all pattern predicates are plain string operations over it.
  */
object Address {
  val CredentialSize = 28 // blake2b-224
  private val credHex = 2 * CredentialSize

  /** Re-serialize an on-chain (CIP-19) address into the kupo hex form.
    * On-chain layout: header(1) ‖ payment(28) ‖ [delegation(28) | pointer].
    * Header high nibble = type (0-7 shelley, 8 byron); low nibble = network.
    * Mirrors addressToRow (/root/reference/src/Kupo/Data/Database.hs:568-599). */
  def fromOnChainBytes(bytes: Array[Byte]): Option[String] = {
    if (bytes.isEmpty) return None
    val header = bytes(0) & 0xff
    val addrType = header >>> 4
    val network = header & 0x0f
    def paymentBit(h: Int) = if ((addrType & 1) == 1) h | 0x10 else h
    def delegationBit(h: Int) = if ((addrType & 2) == 2) h | 0x20 else h
    addrType match {
      case t if t <= 3 => // base address: payment ‖ delegation
        if (bytes.length != 1 + 2 * CredentialSize) None
        else {
          val payment = bytes.slice(1, 1 + CredentialSize)
          val delegation = bytes.slice(1 + CredentialSize, 1 + 2 * CredentialSize)
          val h = delegationBit(paymentBit(network))
          Some(Hex.encode(Array(1.toByte) ++ delegation ++ Array(h.toByte) ++ payment))
        }
      case 4 | 5 => // pointer address: payment ‖ variable-length pointer
        if (bytes.length <= 1 + CredentialSize) None
        else {
          val payment = bytes.slice(1, 1 + CredentialSize)
          val ptr = bytes.drop(1 + CredentialSize)
          val h = paymentBit(network | 0x40)
          Some(Hex.encode(Array(2.toByte) ++ ptr ++ Array(h.toByte) ++ payment))
        }
      case 6 | 7 => // enterprise address: payment only
        if (bytes.length != 1 + CredentialSize) None
        else {
          val payment = bytes.slice(1, 1 + CredentialSize)
          val h = paymentBit(network | 0x20 | 0x40)
          Some(Hex.encode(Array(3.toByte) ++ Array(h.toByte) ++ payment))
        }
      case 8 => // byron/bootstrap: tag 0 ‖ the original CBOR bytes
        Some(Hex.encode(Array(0.toByte) ++ bytes))
      case _ => None
    }
  }

  /** Inverse of fromOnChainBytes — back to the CIP-19 wire form (the
    * reference's addressFromRow, Database.hs:601-…). */
  def toOnChainBytes(kupoHex: String): Option[Array[Byte]] =
    Hex.decode(kupoHex).flatMap { bytes =>
      if (bytes.length < 2) None
      else (bytes(0) & 0xff) match {
        case 0 => Some(bytes.drop(1))
        case 1 if bytes.length == 2 + 2 * CredentialSize =>
          val delegation = bytes.slice(1, 1 + CredentialSize)
          val h = bytes(1 + CredentialSize) & 0xff
          val payment = bytes.drop(2 + CredentialSize)
          val t = (if ((h & 0x10) != 0) 1 else 0) | (if ((h & 0x20) != 0) 2 else 0)
          Some(Array(((t << 4) | (h & 0x0f)).toByte) ++ payment ++ delegation)
        case 2 if bytes.length > 2 + CredentialSize =>
          val ptr = bytes.slice(1, bytes.length - CredentialSize - 1)
          val h = bytes(bytes.length - CredentialSize - 1) & 0xff
          val payment = bytes.takeRight(CredentialSize)
          val t = 4 | (if ((h & 0x10) != 0) 1 else 0)
          Some(Array(((t << 4) | (h & 0x0f)).toByte) ++ payment ++ ptr)
        case 3 if bytes.length == 2 + CredentialSize =>
          val h = bytes(1) & 0xff
          val t = 6 | (if ((h & 0x10) != 0) 1 else 0)
          Some(Array(((t << 4) | (h & 0x0f)).toByte) ++ bytes.drop(2))
        case _ => None
      }
    }

  def isBootstrap(kupoHex: String): Boolean = kupoHex.startsWith("00")

  /** Structural validation of Byron (bootstrap) address bytes — the CBOR
    * envelope `[ #6.24(bytes), crc32 ]`, with the CRC checked against the
    * payload. Mirrors what the reference gets from the ledger's address
    * decoder on the base58 path (/root/reference/src/Kupo/Data/Pattern.hs:281-284,
    * addressFromBytes → decodeAddrLenient): arbitrary base58-decodable text
    * must NOT parse as an exact bootstrap address. */
  def isValidByron(bytes: Array[Byte]): Boolean = {
    // 0x82 array(2) ‖ 0xd8 0x18 tag(24) ‖ bytes header ‖ payload ‖ uint crc
    if (bytes.length < 8 || (bytes(0) & 0xff) != 0x82 ||
        (bytes(1) & 0xff) != 0xd8 || (bytes(2) & 0xff) != 0x18) return false
    val (payloadStart, payloadLen) = (bytes(3) & 0xff) match {
      case h if h >= 0x40 && h <= 0x57 => (4, h - 0x40)          // tiny bytes
      case 0x58 if bytes.length > 4    => (5, bytes(4) & 0xff)   // 1-byte length
      case 0x59 if bytes.length > 5    =>                        // 2-byte length
        (6, ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff))
      case _ => return false
    }
    val crcStart = payloadStart + payloadLen
    if (crcStart >= bytes.length) return false
    val crcBytes = bytes.drop(crcStart)
    val crcValue: Long = (crcBytes(0) & 0xff) match {
      case h if h < 0x18                          => if (crcBytes.length == 1) h.toLong else return false
      case 0x18 if crcBytes.length == 2           => crcBytes(1) & 0xffL
      case 0x19 if crcBytes.length == 3           =>
        ((crcBytes(1) & 0xffL) << 8) | (crcBytes(2) & 0xffL)
      case 0x1a if crcBytes.length == 5           =>
        crcBytes.drop(1).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      case _ => return false
    }
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, payloadStart, payloadLen)
    crc.getValue == crcValue
  }

  /** Payment credential = last 28 bytes, for every non-bootstrap address
    * (invariant guaranteed by the serialization — Database.hs:560-564). */
  def paymentPartHex(kupoHex: String): Option[String] =
    if (isBootstrap(kupoHex) || kupoHex.length < credHex + 4) None
    else Some(kupoHex.substring(kupoHex.length - credHex))

  /** Delegation credential: only base addresses (tag 1) carry one. */
  def delegationPartHex(kupoHex: String): Option[String] =
    if (kupoHex.startsWith("01") && kupoHex.length == 2 * (2 + 2 * CredentialSize))
      Some(kupoHex.substring(2, 2 + credHex))
    else None
}
