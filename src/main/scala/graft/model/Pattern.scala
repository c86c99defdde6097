package graft.model

import graft.codec.{Base58, Bech32, Blake2b, Hex}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The pattern algebra — a predicate language over indexed outputs.
  * ADT mirrors the reference's 10 constructors
  * (/root/reference/src/Kupo/Data/Pattern.hs:115-138); text codec mirrors
  * patternToText/patternFromText (:227-381); the partial order mirrors
  * includes/overlaps (:143-221). Instead of compiling to SQL strings
  * (patternToSql, /root/reference/src/Kupo/Data/Database.hs:712-765) each
  * pattern compiles to a Catalyst `Column` predicate over the inputs schema —
  * Catalyst then pushes the predicate into the parquet scan.
  *
  * All hex is lowercase; credentials are 28-byte blake2b-224 hex (56 chars);
  * transaction ids are 32-byte hex (64 chars).
  */
sealed trait Pattern {
  import Pattern._

  def toText: String = this match {
    case MatchAny(true)                    => "*"
    case MatchAny(false)                   => "*/*"
    case MatchExact(addr)                  =>
      // patternToText emits base16 of the ON-CHAIN bytes (Pattern.hs:236-237)
      Address.toOnChainBytes(addr).map(Hex.encode).getOrElse(addr)
    case MatchPayment(c)                   => s"$c/*"
    case MatchDelegation(c)                => s"*/$c"
    case MatchPaymentAndDelegation(p, d)   => s"$p/$d"
    case MatchTransactionId(txId)          => s"*@$txId"
    case MatchOutputReference(txId, ix)    => s"$ix@$txId"
    case MatchPolicyId(p)                  => s"$p.*"
    case MatchAssetId(p, a)                => s"$p.$a"
    case MatchMetadataTag(tag)             => s"{$tag}"
  }

  /** In-memory address predicate — matchingAddress (Pattern.hs:398-417). */
  def matchesAddress(addrHex: String): Boolean = this match {
    case MatchAny(includingBootstrap) => includingBootstrap || !Address.isBootstrap(addrHex)
    case MatchExact(a)                => a == addrHex
    case MatchPayment(c)              => Address.paymentPartHex(addrHex).contains(c)
    case MatchDelegation(c)           => Address.delegationPartHex(addrHex).contains(c)
    case MatchPaymentAndDelegation(p, d) =>
      Address.paymentPartHex(addrHex).contains(p) && Address.delegationPartHex(addrHex).contains(d)
    case _ => false
  }

  /** Partial order: `this includes that` iff matches(that) ⊆ matches(this)
    * (Pattern.hs:179-216). */
  def includes(that: Pattern): Boolean = (this, that) match {
    case (p, MatchExact(addr))                 => p.matchesAddress(addr)
    case (MatchAny(true), _)                   => true
    case (MatchAny(false), y)                  => y != MatchAny(true)
    case (MatchPayment(a), MatchPayment(b))    => a == b
    case (MatchPayment(a), MatchPaymentAndDelegation(b, _)) => a == b
    case (MatchDelegation(a), MatchDelegation(b))           => a == b
    case (MatchDelegation(a), MatchPaymentAndDelegation(_, b)) => a == b
    case (MatchPaymentAndDelegation(a, b), MatchPaymentAndDelegation(c, d)) => a == c && b == d
    case (MatchOutputReference(t, i), MatchOutputReference(t2, i2)) => t == t2 && i == i2
    case (MatchOutputReference(t, _), MatchTransactionId(t2)) => t == t2
    case (MatchTransactionId(a), MatchTransactionId(b))       => a == b
    case (MatchPolicyId(a), MatchPolicyId(b))                 => a == b
    case (MatchAssetId(p, a), MatchAssetId(p2, a2))           => p == p2 && a == a2
    case (MatchPolicyId(a), MatchAssetId(b, _))               => a == b
    case (MatchMetadataTag(a), MatchMetadataTag(b))           => a == b
    case _ => false
  }

  /** Symmetric overlap check against a set (Pattern.hs:143-177). */
  def overlaps(others: Set[Pattern]): Boolean = {
    def overlapTwo(x: Pattern, y: Pattern): Boolean = (x, y) match {
      case (MatchAny(_), _)                       => true
      case (MatchExact(addr), p)                  => p.matchesAddress(addr)
      case (MatchPayment(a), MatchPayment(b))     => a == b
      case (MatchPayment(a), MatchPaymentAndDelegation(b, _)) => a == b
      case (MatchDelegation(a), MatchDelegation(b))            => a == b
      case (MatchDelegation(a), MatchPaymentAndDelegation(_, b)) => a == b
      case (MatchPaymentAndDelegation(a, b), MatchPaymentAndDelegation(c, d)) => a == c || b == d
      case (MatchOutputReference(t, i), MatchOutputReference(t2, i2)) => t == t2 && i == i2
      case (MatchOutputReference(t, _), MatchTransactionId(t2)) => t == t2
      case (MatchTransactionId(a), MatchTransactionId(b))       => a == b
      case (MatchPolicyId(a), MatchPolicyId(b))                 => a == b
      case (MatchPolicyId(a), MatchAssetId(b, _))               => a == b
      case (MatchAssetId(a, b), MatchAssetId(c, d))             => a == c && b == d
      case (MatchMetadataTag(a), MatchMetadataTag(b))           => a == b
      case _ => false
    }
    others.exists(p => overlapTwo(this, p) || overlapTwo(p, this))
  }

  /** Compile to a Catalyst predicate over the inputs schema (§1.4 of SURVEY.md):
    * address STRING (kupo hex), tx_id STRING (hex), output_index INT,
    * value STRUCT<coins, assets MAP<STRING, MAP<STRING, DECIMAL>>>,
    * metadata_labels ARRAY<BIGINT> (ingest-time only).
    * Replaces patternToSql (Database.hs:712-765); note MatchAssetId is exact
    * here — no post-scan re-check needed (the reference re-filters in the HTTP
    * layer, Http.hs:657-670, because its SQL can only see the policy table). */
  def toPredicate: Column = this match {
    case MatchAny(true)                  => lit(true)
    case MatchAny(false)                 => !col("address").startsWith("00")
    case MatchExact(a)                   => col("address") === lit(a)
    case MatchPayment(c)                 =>
      !col("address").startsWith("00") && col("address").endsWith(lit(c))
    case MatchDelegation(c)              => col("address").startsWith("01" + c)
    case MatchPaymentAndDelegation(p, d) =>
      col("address").startsWith("01" + d) && col("address").endsWith(lit(p))
    case MatchTransactionId(t)           => col("tx_id") === lit(t)
    case MatchOutputReference(t, ix)     => col("tx_id") === lit(t) && col("output_index") === lit(ix)
    case MatchPolicyId(p)                => col("value.assets").getItem(p).isNotNull
    case MatchAssetId(p, a)              => col("value.assets").getItem(p).getItem(a).isNotNull
    case MatchMetadataTag(tag)           => array_contains(col("metadata_labels"), tag)
  }

  /** True when the predicate needs transaction metadata — such patterns are
    * index-time only, like the reference (Database.hs:711,762-763 errors out). */
  def isIndexOnly: Boolean = this.isInstanceOf[Pattern.MatchMetadataTag]
}

object Pattern {
  final case class MatchAny(includingBootstrap: Boolean) extends Pattern
  /** addr = full address in kupo hex form. */
  final case class MatchExact(addressHex: String) extends Pattern
  final case class MatchPayment(credentialHex: String) extends Pattern
  final case class MatchDelegation(credentialHex: String) extends Pattern
  final case class MatchPaymentAndDelegation(paymentHex: String, delegationHex: String) extends Pattern
  final case class MatchTransactionId(txIdHex: String) extends Pattern
  final case class MatchOutputReference(txIdHex: String, outputIndex: Int) extends Pattern
  final case class MatchPolicyId(policyHex: String) extends Pattern
  final case class MatchAssetId(policyHex: String, assetNameHex: String) extends Pattern
  final case class MatchMetadataTag(tag: Long) extends Pattern

  private val Wildcard = "*"
  private val Blake2b256Size = 32
  private val PolicyIdSize = 28
  private val TxIdSize = 32
  private val MaxAssetNameSize = 32

  /** Disjunction of a pattern set — M3 of the ingest kernel (Pattern.hs:606-613). */
  def anyOf(patterns: Iterable[Pattern]): Column =
    patterns.map(_.toPredicate).reduceOption(_ || _).getOrElse(lit(false))

  /** Text → Pattern, mirroring patternFromText (Pattern.hs:252-381).
    * Accepts base16 / bech32 / base58 forms; 32-byte verification keys are
    * blake2b-224-hashed into credentials (:307-335). */
  def fromText(txt: String): Option[Pattern] =
    readerAny(txt)
      .orElse(readerExact(txt))
      .orElse(readerPaymentOrDelegation(txt))
      .orElse(readerOutputReference(txt))
      .orElse(readerAssetId(txt))
      .orElse(readerMetadataTag(txt))

  private def readerAny(txt: String): Option[Pattern] =
    if (txt == Wildcard) Some(MatchAny(includingBootstrap = true)) else None

  private def readerExact(txt: String): Option[Pattern] = {
    val base16 = Hex.decode(txt).flatMap(Address.fromOnChainBytes).map(MatchExact(_))
    def bech32 = Bech32.decode(txt).flatMap { case (hrp, bytes) =>
      if (hrp == "addr" || hrp == "addr_test")
        Address.fromOnChainBytes(bytes).map(MatchExact(_))
      else if (hrp == "stake" || hrp == "stake_test")
        // stake addresses: header byte then the delegation credential
        if (bytes.length == 1 + Address.CredentialSize)
          Some(MatchDelegation(Hex.encode(bytes.drop(1))))
        else None
      else None
    }
    def base58 = Base58.decode(txt).flatMap { bytes =>
      // full structural check (CBOR envelope + CRC32) — the reference gets
      // this from the ledger's address decoder; a plain first-byte heuristic
      // would let arbitrary base58 text parse as a bootstrap address
      if (Address.isValidByron(bytes)) Some(MatchExact("00" + Hex.encode(bytes)))
      else None
    }
    base16.orElse(bech32).orElse(base58)
  }

  /** base16 or bech32 credential; 32-byte keys hashed to 28-byte credentials. */
  private def readerCredential(str: String): Option[String] = {
    val viaBase16 = Hex.decode(str).flatMap { bytes =>
      if (bytes.length == Blake2b256Size) Some(Hex.encode(Blake2b.hash224(bytes)))
      else if (bytes.length == Address.CredentialSize) Some(Hex.encode(bytes))
      else None
    }
    def viaBech32 = Bech32.decode(str).flatMap { case (hrp, bytes) =>
      if (bytes.length == Blake2b256Size && Set("vk", "addr_vk", "stake_vk")(hrp))
        Some(Hex.encode(Blake2b.hash224(bytes)))
      else if (bytes.length == Address.CredentialSize &&
               Set("vkh", "addr_vkh", "stake_vkh", "script")(hrp))
        Some(Hex.encode(bytes))
      else None
    }
    viaBase16.orElse(viaBech32)
  }

  private def readerPaymentOrDelegation(txt: String): Option[Pattern] =
    txt.split("/", -1) match {
      case Array(p, d) if p == Wildcard && d == Wildcard => Some(MatchAny(includingBootstrap = false))
      case Array(p, d) if p == Wildcard => readerCredential(d).map(MatchDelegation(_))
      case Array(p, d) if d == Wildcard => readerCredential(p).map(MatchPayment(_))
      case Array(p, d) =>
        for { pc <- readerCredential(p); dc <- readerCredential(d) }
          yield MatchPaymentAndDelegation(pc, dc)
      case _ => None
    }

  private def readerOutputReference(txt: String): Option[Pattern] =
    txt.split("@", -1) match {
      case Array(star, txId) if star == Wildcard =>
        txIdFromText(txId).map(MatchTransactionId(_))
      case Array(ix, txId) =>
        for {
          i <- ix.toIntOption if i >= 0 && i <= 0xffff
          t <- txIdFromText(txId)
        } yield MatchOutputReference(t, i)
      case _ => None
    }

  private def txIdFromText(s: String): Option[String] =
    Hex.decode(s).filter(_.length == TxIdSize).map(_ => s.toLowerCase)

  private def readerAssetId(txt: String): Option[Pattern] =
    txt.split("\\.", -1) match {
      case Array(policy, star) if star == Wildcard =>
        policyFromText(policy).map(MatchPolicyId(_))
      case Array(policy, name) =>
        for {
          p <- policyFromText(policy)
          a <- Hex.decode(name).filter(_.length <= MaxAssetNameSize).map(_ => name.toLowerCase)
        } yield MatchAssetId(p, a)
      case _ => None
    }

  private def policyFromText(s: String): Option[String] =
    Hex.decode(s).filter(_.length == PolicyIdSize).map(_ => s.toLowerCase)

  private def readerMetadataTag(txt: String): Option[Pattern] =
    if (txt.length > 2 && txt.head == '{' && txt.last == '}') {
      val inner = txt.substring(1, txt.length - 1)
      inner.toLongOption.filter(t => t >= 0 && inner.forall(_.isDigit)).map(MatchMetadataTag(_))
    } else None
}
