package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Shared OpenAPI-document validator (extracted from OpenApiSpec so the
  * live-HTTP suite can validate wire bodies against the same reference
  * artifact, /root/reference/docs/api/nightly.yaml). Implements the
  * JSON-Schema subset the document uses: $ref, oneOf/anyOf/allOf, type,
  * enum, required, properties, additionalProperties, propertyNames, items,
  * pattern, min/maxLength, minimum/maximum, contentEncoding base16. */
object OpenApiCheck {

  val mapper = new ObjectMapper()
  type YMap = java.util.Map[String, Object]

  lazy val schemas: YMap = {
    val opts = new org.yaml.snakeyaml.LoaderOptions()
    opts.setMaxAliasesForCollections(100000) // the spec reuses &anchors heavily
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(opts))
    val in = new java.io.FileInputStream("/root/reference/docs/api/nightly.yaml")
    val doc = try yaml.load[YMap](in) finally in.close()
    doc.get("components").asInstanceOf[YMap].get("schemas").asInstanceOf[YMap]
  }

  def asYMap(o: Object): YMap = o.asInstanceOf[YMap]

  def resolve(s: YMap): YMap = s.get("$ref") match {
    case r: String =>
      val name = r.stripPrefix("#/components/schemas/")
      val t = schemas.get(name)
      require(t != null, s"dangling $$ref: $r")
      resolve(asYMap(t))
    case _ => s
  }

  /** Validate `node` against `schema0`; returns error strings (empty = ok). */
  def validate(node: JsonNode, schema0: YMap, path: String): List[String] = {
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

  /** Errors for a JSON string against a named component schema. */
  def errorsOf(json: String, schemaName: String): List[String] =
    validate(mapper.readTree(json), asYMap(schemas.get(schemaName)), schemaName)
}
