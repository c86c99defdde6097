package graft

import graft.query.FoldInputs
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** F8/S10 response-surface sweep: every datum kind × script kind × spent
  * shape × asset shape, under each quantity-encoding × inline-resolution
  * mode, validated against the reference's OpenAPI response rules
  * (/root/reference/docs/api — the OpenAPI yaml specs; encoder resultToJson
  * /root/reference/src/Kupo/Data/Pattern.hs:447-522):
  *  - exact field ORDER, explicit-null scalars vs ABSENT optional pairs;
  *  - value.assets always an object, policies DESC / asset names ASC,
  *    bare-policy key for empty asset names;
  *  - quantities quoted iff the string encoding is requested;
  *  - script renders as {script, language} with the tag byte stripped — and
  *    an out-of-vocabulary tag byte must NOT null the row away (the
  *    round-2 latent hole), it renders "unknown".
  * The reference validates generated responses against the OpenAPI spec
  * (test/Test/Kupo/App/HttpSpec.hs); the hand goldens in ApiSurfaceSpec pin
  * bytes, this sweep pins the rules. */
class ApiJsonPropertySpec extends SparkSpec {

  // ---- minimal strict JSON parser preserving field order ----
  sealed trait JV
  final case class JObj(fields: Vector[(String, JV)]) extends JV {
    def keys: Vector[String] = fields.map(_._1)
    def apply(k: String): JV = fields.find(_._1 == k)
      .getOrElse(sys.error(s"missing key $k"))._2
  }
  final case class JArr(items: Vector[JV]) extends JV
  final case class JStr(s: String) extends JV
  final case class JNum(text: String) extends JV
  final case class JBool(b: Boolean) extends JV
  case object JNull extends JV

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      if (i >= s.length || s(i) != c) sys.error(s"expected '$c' at $i in $s"); i += 1
    }
    def parse(): JV = { ws(); val v = value(); ws(); require(i == s.length, s"trailing at $i"); v }
    private def value(): JV = s(i) match {
      case '{' => obj()
      case '[' => arr()
      case '"' => JStr(str())
      case 't' => require(s.startsWith("true", i)); i += 4; JBool(true)
      case 'f' => require(s.startsWith("false", i)); i += 5; JBool(false)
      case 'n' => require(s.startsWith("null", i)); i += 4; JNull
      case _   => num()
    }
    private def obj(): JObj = {
      expect('{'); ws()
      val b = Vector.newBuilder[(String, JV)]
      if (s(i) == '}') { i += 1; return JObj(b.result()) }
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':'); ws(); b += (k -> value()); ws()
        if (s(i) == ',') i += 1 else { expect('}'); more = false }
      }
      JObj(b.result())
    }
    private def arr(): JArr = {
      expect('['); ws()
      val b = Vector.newBuilder[JV]
      if (s(i) == ']') { i += 1; return JArr(b.result()) }
      var more = true
      while (more) {
        ws(); b += value(); ws()
        if (s(i) == ',') i += 1 else { expect(']'); more = false }
      }
      JArr(b.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') { sb.append(s(i)).append(s(i + 1)); i += 2 }
        else { sb.append(s(i)); i += 1 }
      }
      i += 1
      sb.toString
    }
    private def num(): JNum = {
      val st = i
      while (i < s.length && ("+-.eE".contains(s(i)) || s(i).isDigit)) i += 1
      require(i > st, s"bad number at $st")
      JNum(s.substring(st, i))
    }
  }
  private def parseJson(s: String): JObj = new P(s).parse().asInstanceOf[JObj]

  // ---- the combo space (shared with OpenApiSpec) ----
  import ApiComboFixture.{combos, languageOf, pHi, pLo, scriptBytes, Combo}

  private lazy val frame = ApiComboFixture.frame(spark)

  for (stringQuantities <- Seq(false, true); inlineAll <- Seq(false, true))
    test(s"asJson obeys the OpenAPI response rules " +
      s"(stringQuantities=$stringQuantities, inlineAll=$inlineAll)") {
      val got = FoldInputs.asJson(frame, stringQuantities, inlineAll)
        .collect().map(_.getString(0))
      assert(got.length == combos.length)
      val byId = got.map { s =>
        val o = parseJson(s) // strict parse = well-formedness gate
        o("transaction_index").asInstanceOf[JNum].text.toInt -> o
      }.toMap
      combos.foreach { c =>
        val o = byId(c.id)
        // field ORDER (Pattern.hs:447-522): optional pairs slot in place
        val expectKeys = Vector("transaction_index", "transaction_id", "output_index",
          "address", "value", "datum_hash") ++
          (if (inlineAll) Vector("datum") else Vector()) ++
          (if (c.datum != "none") Vector("datum_type") else Vector()) ++
          Vector("script_hash") ++
          (if (inlineAll) Vector("script") else Vector()) ++
          Vector("created_at", "spent_at")
        assert(o.keys == expectKeys, s"combo $c: keys ${o.keys}")
        // nullable scalars are explicit nulls
        assert(o("datum_hash") == (if (c.datum == "none") JNull else JStr(if (c.datum == "hash") "dd" * 32 else "ee" * 32)))
        assert(o("script_hash") == (if (c.script == "none") JNull else JStr("77" * 28)))
        if (c.datum != "none")
          assert(o("datum_type") == JStr(if (c.datum == "hash") "hash" else "inline"))
        if (inlineAll) {
          // resolved datum: bytes for inline, null when unresolved/absent
          assert(o("datum") == (if (c.datum == "inline") JStr("d87980") else JNull))
          o("script") match {
            case JNull => assert(c.script == "none")
            case so: JObj =>
              assert(so.keys == Vector("script", "language"))
              assert(so("script") == JStr(scriptBytes(c.script).drop(2)))
              assert(so("language") == JStr(languageOf(c.script)),
                s"combo $c: ${so("language")}")
            case other => fail(s"combo $c: script = $other")
          }
        }
        // value: coins + assets object, quantity encoding honored
        val v = o("value").asInstanceOf[JObj]
        assert(v.keys == Vector("coins", "assets"))
        val coins = v("coins")
        if (stringQuantities) assert(coins == JStr((1000 + c.id).toString))
        else assert(coins == JNum((1000 + c.id).toString))
        val assets = v("assets").asInstanceOf[JObj]
        if (c.assets == "empty") assert(assets.fields.isEmpty)
        else {
          // policies DESC, names ASC, bare key for the empty asset name
          assert(assets.keys == Vector(pHi, s"$pLo.0000", s"$pLo.abcd"))
          val qs = assets.fields.map(_._2)
          if (stringQuantities) assert(qs == Vector(JStr("5"), JStr("9"), JStr("7")))
          else assert(qs == Vector(JNum("5"), JNum("9"), JNum("7")))
        }
        // created_at / spent_at point objects
        val cr = o("created_at").asInstanceOf[JObj]
        assert(cr.keys == Vector("slot_no", "header_hash"))
        assert(cr("slot_no") == JNum((10 + c.id).toString)) // never quoted
        o("spent_at") match {
          case JNull => assert(c.spent == "unspent")
          case so: JObj =>
            assert(c.spent != "unspent")
            assert(so.keys == Vector("slot_no", "header_hash", "transaction_id",
              "input_index", "redeemer"))
            assert(so("slot_no") == JNum("90"))
            assert(so("transaction_id") == JStr("cc" * 32))
            assert(so("input_index") == JNum("2"))
            assert(so("redeemer") ==
              (if (c.spent == "spent") JStr("4d0101") else JNull))
          case other => fail(s"combo $c: spent_at = $other")
        }
      }
    }
}
