package graft

import graft.query.{FoldInputs, Health}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Spec-DRIVEN response validation: every JSON surface the engine produces
  * is checked against the reference's own OpenAPI document
  * (/root/reference/docs/api/nightly.yaml), the same artifact the
  * reference's HTTP suite validates against
  * (/root/reference/test/Test/Kupo/App/HttpSpec.hs:159-296 findSchema +
  * validateJSON). ApiJsonPropertySpec encodes the response rules by hand;
  * this suite removes the hand-coding as a trust anchor — the yaml is the
  * oracle. The validator implements the JSON-Schema subset the document
  * uses: $ref, oneOf/anyOf/allOf, type, enum, required, properties,
  * additionalProperties, propertyNames, items, pattern, min/maxLength,
  * minimum/maximum, and contentEncoding base16. */
class OpenApiSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private type YMap = java.util.Map[String, Object]

  private lazy val schemas: YMap = {
    val opts = new org.yaml.snakeyaml.LoaderOptions()
    opts.setMaxAliasesForCollections(100000) // the spec reuses &anchors heavily
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(opts))
    val in = new java.io.FileInputStream("/root/reference/docs/api/nightly.yaml")
    val doc = try yaml.load[YMap](in) finally in.close()
    doc.get("components").asInstanceOf[YMap].get("schemas").asInstanceOf[YMap]
  }

  private def asYMap(o: Object): YMap = o.asInstanceOf[YMap]

  private def resolve(s: YMap): YMap = s.get("$ref") match {
    case r: String =>
      val name = r.stripPrefix("#/components/schemas/")
      val t = schemas.get(name)
      require(t != null, s"dangling $$ref: $r")
      resolve(asYMap(t))
    case _ => s
  }

  /** Validate `node` against `schema0`; returns error strings (empty = ok). */
  private def validate(node: JsonNode, schema0: YMap, path: String): List[String] = {
    val schema = resolve(schema0)
    def err(m: String) = List(s"$path: $m")
    def intOf(o: Object): Long = o match {
      case n: Number => n.longValue()
      case s: String => s.toLong
    }

    def validateString(): List[String] =
      if (!node.isTextual) err(s"expected string, got $node")
      else {
        val s = node.asText
        val lenErrs =
          (Option(schema.get("minLength")).map(intOf).filter(s.length < _)
             .map(m => s"$path: length ${s.length} < minLength $m") ++
           Option(schema.get("maxLength")).map(intOf).filter(s.length > _)
             .map(m => s"$path: length ${s.length} > maxLength $m")).toList
        val patErrs = Option(schema.get("pattern")).map(_.toString).toList.flatMap { p =>
          // AssetIdPattern's pattern embeds a literal '*' alternative
          // ("(*|[0-9a-f]{2,64})") which is not valid ECMA/Java regex —
          // tolerate the document's own dialect by skipping uncompilable
          // patterns (the reference never machine-validates them either)
          try {
            if (java.util.regex.Pattern.compile(p).matcher(s).find()) Nil
            else err(s"'$s' !~ /$p/")
          } catch { case _: java.util.regex.PatternSyntaxException => Nil }
        }
        val encErrs = Option(schema.get("contentEncoding")).map(_.toString).toList.flatMap {
          case "base16" =>
            if (s.matches("[0-9a-fA-F]*") && s.length % 2 == 0) Nil
            else err(s"'$s' is not base16")
          case _ => Nil // bech32/base58 examples carry their own charsets
        }
        val enumErrs = Option(schema.get("enum")).toList.flatMap { e =>
          val allowed = e.asInstanceOf[java.util.List[Object]].asScala.map(String.valueOf)
          if (allowed.contains(s)) Nil else err(s"'$s' not in enum $allowed")
        }
        lenErrs ++ patErrs ++ encErrs ++ enumErrs
      }

    def validateObject(): List[String] =
      if (!node.isObject) err(s"expected object, got $node")
      else {
        val fields = node.properties().asScala.map(e => e.getKey -> e.getValue).toList
        val props = Option(schema.get("properties")).map(asYMap)
          .map(_.asScala.toMap).getOrElse(Map.empty)
        val reqErrs = Option(schema.get("required")).toList.flatMap {
          _.asInstanceOf[java.util.List[Object]].asScala.toList
            .map(String.valueOf).filterNot(node.has)
            .map(k => s"$path: missing required '$k'")
        }
        val fieldErrs = fields.flatMap { case (k, v) =>
          props.get(k) match {
            case Some(sub) => validate(v, asYMap(sub), s"$path.$k")
            case None => schema.get("additionalProperties") match {
              case b: java.lang.Boolean if !b => err(s"unexpected property '$k'")
              case m: java.util.Map[_, _] => validate(v, asYMap(m), s"$path.$k")
              case _ => Nil // absent = additional allowed
            }
          }
        }
        val nameErrs = Option(schema.get("propertyNames")).map(asYMap).toList.flatMap { pn =>
          fields.map(_._1).flatMap { k =>
            val patOk = Option(pn.get("pattern")).map(_.toString).forall(p =>
              java.util.regex.Pattern.compile(p).matcher(k).find())
            val typeOk = Option(pn.get("type")).map(_.toString).forall {
              case "integer" => k.matches("-?\\d+")
              case _         => true
            }
            if (patOk && typeOk) Nil else List(s"$path: bad property name '$k'")
          }
        }
        reqErrs ++ fieldErrs ++ nameErrs
      }

    def validateNumeric(integral: Boolean): List[String] = {
      val kindOk = if (integral) node.isIntegralNumber else node.isNumber
      if (!kindOk) err(s"expected ${if (integral) "integer" else "number"}, got $node")
      else {
        (Option(schema.get("minimum")).map(intOf).filter(node.asDouble < _)
           .map(m => s"$path: ${node.asDouble} < minimum $m") ++
         Option(schema.get("maximum")).map(intOf).filter(node.asDouble > _)
           .map(m => s"$path: ${node.asDouble} > maximum $m")).toList
      }
    }

    val alts = Option(schema.get("oneOf")).orElse(Option(schema.get("anyOf")))
    if (alts.isDefined) {
      val branches = alts.get.asInstanceOf[java.util.List[Object]].asScala.toList
      val results = branches.map(b => validate(node, asYMap(b), path))
      if (results.exists(_.isEmpty)) Nil
      else err(s"no alternative matched $node " +
        s"(${results.flatMap(_.headOption).mkString(" | ")})")
    } else if (schema.containsKey("allOf")) {
      schema.get("allOf").asInstanceOf[java.util.List[Object]].asScala.toList
        .flatMap(b => validate(node, asYMap(b), path))
    } else Option(schema.get("type")).map(_.toString) match {
      case Some("object")  => validateObject()
      case Some("string")  => validateString()
      case Some("integer") => validateNumeric(integral = true)
      case Some("number")  => validateNumeric(integral = false)
      case Some("boolean") => if (node.isBoolean) Nil else err(s"expected boolean, got $node")
      case Some("null")    => if (node.isNull) Nil else err(s"expected null, got $node")
      case Some("array") =>
        if (!node.isArray) err(s"expected array, got $node")
        else Option(schema.get("items")).map(asYMap).toList.flatMap { items =>
          node.asScala.zipWithIndex.flatMap { case (el, i) =>
            validate(el, items, s"$path[$i]")
          }
        }
      case Some(other) => err(s"unsupported type '$other' in spec")
      case None =>
        if (schema.containsKey("properties") || schema.containsKey("additionalProperties"))
          validateObject()
        else if (schema.containsKey("enum") || schema.containsKey("pattern") ||
                 schema.containsKey("contentEncoding")) validateString()
        else Nil // bare description/title node: nothing to check
    }
  }

  private def assertValid(json: String, schemaName: String): Unit = {
    val errs = validate(mapper.readTree(json), asYMap(schemas.get(schemaName)), schemaName)
    assert(errs.isEmpty, s"$json\n  ${errs.mkString("\n  ")}")
  }

  test("the spec loads and carries the response schemas the API serves") {
    Seq("Match", "MatchQuantityAsString", "Health", "Point", "Metadatum",
      "Pattern", "Value", "SpentAt").foreach { n =>
      assert(schemas.containsKey(n), s"schema $n missing from nightly.yaml")
    }
    // merge keys (<<: *anchor) must be flattened by the loader: Health's
    // most_recent_checkpoint inherits slotNo's type via a merge
    val h = resolve(asYMap(schemas.get("Health")))
    val mrc = asYMap(asYMap(asYMap(h.get("properties")).get("most_recent_checkpoint"))
      .get("oneOf").asInstanceOf[java.util.List[Object]].get(0))
    assert(mrc.get("type") == "integer", s"merge key not flattened: $mrc")
  }

  test("the validator itself rejects (negative controls)") {
    def errsOf(json: String, schemaName: String): List[String] =
      validate(mapper.readTree(json), asYMap(schemas.get(schemaName)), schemaName)
    // wrong type, missing required, unexpected property, bad hex, bad enum
    assert(errsOf(""""not-an-object"""", "Point").nonEmpty)
    assert(errsOf("""{"slot_no":1}""", "Point").nonEmpty)
    assert(errsOf("""{"slot_no":1,"header_hash":"ab","extra":1}""", "Point").nonEmpty)
    assert(errsOf("""{"slot_no":1,"header_hash":"zz"}""", "Point").nonEmpty)
    assert(errsOf("""{"slot_no":-1,"header_hash":"ab"}""", "Point").nonEmpty)
    assert(errsOf("""{"int":"not-an-int"}""", "Metadatum").nonEmpty)
  }

  for (stringQuantities <- Seq(false, true); inlineAll <- Seq(false, true))
    test("every asJson combo validates against the OpenAPI Match schema " +
      s"(stringQuantities=$stringQuantities, inlineAll=$inlineAll)") {
      val schemaName = if (stringQuantities) "MatchQuantityAsString" else "Match"
      val got = FoldInputs.asJson(ApiComboFixture.frame(spark), stringQuantities, inlineAll)
        .collect().map(_.getString(0))
      assert(got.length == ApiComboFixture.combos.length)
      // the 'corrupt' script combo renders language "unknown" — a DELIBERATE
      // defensive extension for out-of-vocabulary tag bytes that typed
      // ledger data can never produce (the spec enum stops at plutus:v3).
      // In-contract rows must validate; the extension must be the ONLY
      // divergence and only when scripts are inlined.
      val corruptIds = ApiComboFixture.combos
        .filter(_.script == "corrupt").map(_.id.toString).toSet
      got.foreach { json =>
        val node = mapper.readTree(json)
        val isCorrupt = corruptIds.contains(node.get("transaction_index").asText)
        val errs = validate(node, asYMap(schemas.get(schemaName)), schemaName)
        if (!isCorrupt || !inlineAll)
          assert(errs.isEmpty, s"$json\n  ${errs.mkString("\n  ")}")
        else {
          assert(errs.nonEmpty && errs.forall(_.contains("'unknown' not in enum")),
            s"corrupt-tag row diverged beyond the language field: $errs")
        }
      }
    }

  test("health responses validate against the OpenAPI Health schema") {
    val ix = new graft.index.GraftIndex(spark, tmpDir("graft-openapi"))
    // empty index: all-null gauges except the configured policy + version
    assertValid(Health.asJson(Health.snapshot(ix)), "Health")
    // populated index + network params: every gauge non-null
    graft.ingest.Indexer.ingest(ix,
      graft.tools.FixtureChain.toDf(spark, graft.tools.FixtureChain.chain(6)),
      Set[graft.model.Pattern](graft.model.Pattern.MatchAny(includingBootstrap = true)))
    val h = Health.snapshot(ix, Health.ConnectionStatus.Connected,
      nodeTip = Some(120L), lastBlockAtMs = Some(0L), nowMs = 5000L,
      params = Some(Health.NetworkParameters.fromMagic(42L, 0L)))
    assertValid(Health.asJson(h), "Health")
    assert(Health.asJson(h).contains(""""indexes":"installed""""))
    // the deferred policy is the other enum member; the ABSENT-config null
    // rendering (Health.hs:130-136) is intentionally outside the spec's
    // Health schema, so only the enum forms are validated here
    assertValid(Health.asJson(h.copy(indexes = Some(Health.IndexesPolicy.Deferred))), "Health")
  }

  test("metadatum schema'd JSON validates against the OpenAPI Metadatum schema") {
    GraftFunctions.register(spark)
    Seq(
      """{"json":{"msg":["hello",42]}}""",
      """{"json":{"k":{"nested":[1,2,3]}}}""",
      """{"cbor":"a11902d1a0"}""",
      """{"cbor":"8218641864"}""",
      """{"cbor":"4401020304"}"""
    ).foreach { wire =>
      val out = spark.sql(s"SELECT metadatum_schema('$wire')").head().getString(0)
      assert(out != null, s"kernel nulled $wire")
      assertValid(out, "Metadatum")
    }
  }

  test("typed-failure bodies validate against the OpenAPI BadRequest schema") {
    import graft.query.Api
    val failures: Seq[Throwable] = Seq(
      intercept[IllegalArgumentException](
        graft.model.Pattern.fromText("zz/not-a-pattern")
          .getOrElse(throw new IllegalArgumentException(
            "invalid pattern: zz/not-a-pattern"))),
      Api.PointNotFound(42L),
      Api.PointMismatch(42L, "ab" * 32, "cd" * 32),
      new RuntimeException("line\nwith \"quotes\" and\ttabs"))
    failures.foreach { e => assertValid(Api.errorJson(e), "BadRequest") }
  }

  test("pattern wire texts validate against the OpenAPI Pattern schema") {
    Seq("*", "*/*", s"${"ab" * 28}/*", s"*/${"cd" * 28}",
      "addr1vy3qpx09uscywhpp0ekg9zwmq2yj5vp08husfq6qyh2mpps865j6t")
      .foreach { p => assertValid("\"" + p + "\"", "Pattern") }
  }
}
