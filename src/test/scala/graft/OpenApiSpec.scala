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

  import OpenApiCheck.{mapper, schemas, asYMap, resolve, validate}

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
