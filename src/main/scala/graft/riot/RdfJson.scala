package graft.riot

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

import graft.model.{Term, Triple}

/**
 * RDF/JSON reader/writer (reference: jena-arq/.../riot/lang/
 * LangRDFJSON.java and writer/RDFJSONWriter.java; the resource-centric
 * talis shape: `{ subject: { predicate: [ termObject… ] } }`). Strict
 * per the reference's fixture suite (testing/RIOT/Lang/RDF-JSON):
 * predicate values MUST be arrays of term objects with a `type` of
 * uri | literal | bnode. Whole-document per row, pure String→triples —
 * mapPartitions-safe like the other riot readers.
 */
object RdfJson {
  // the reference's tokenizer allows # and // comments in .rj documents
  private val mapper = new ObjectMapper()
    .enable(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_COMMENTS)
    .enable(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_YAML_COMMENTS)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("RDF/JSON: " + msg)

  private def subjTerm(key: String): Term =
    if (key.startsWith("_:")) Term.bnode(key.drop(2)) else Term.iri(key)

  private def termOf(n: JsonNode): Term = {
    if (!n.isObject) fail(s"term must be an object, got $n")
    val tpe = Option(n.get("type")).map(_.asText()).getOrElse(fail("term without 'type'"))
    val value = Option(n.get("value")).map(_.asText()).getOrElse(fail("term without 'value'"))
    tpe match {
      case "uri" => Term.iri(value)
      case "bnode" =>
        if (!value.startsWith("_:")) fail(s"bnode value must start with _: ($value)")
        Term.bnode(value.drop(2))
      case "literal" =>
        val lang = Option(n.get("lang")).map(_.asText()).filter(_.nonEmpty)
        val dt = Option(n.get("datatype")).map(_.asText()).filter(_.nonEmpty)
        (lang, dt) match {
          case (Some(l), None) => Term.langLit(value, l)
          case (None, Some(d)) => Term.lit(value, d)
          case (None, None) => Term.string(value)
          case (Some(_), Some(_)) => fail("literal with both lang and datatype")
        }
      case other => fail(s"unknown term type '$other'")
    }
  }

  def parse(json: String): Seq[Triple] = {
    val root = mapper.readTree(json)
    if (root == null || !root.isObject) fail("document must be a JSON object")
    root.properties().asScala.toSeq.flatMap { se =>
      val s = subjTerm(se.getKey)
      if (!se.getValue.isObject) fail(s"subject value must be an object (${se.getKey})")
      se.getValue.properties().asScala.toSeq.flatMap { pe =>
        val p = Term.iri(pe.getKey)
        if (!pe.getValue.isArray)
          fail(s"predicate value must be an ARRAY of term objects (${pe.getKey})")
        pe.getValue.elements().asScala.toSeq.map(o => Triple(s, p, termOf(o)))
      }
    }.distinct
  }

  def write(triples: Seq[Triple]): String = {
    val f = JsonNodeFactory.instance
    val root = f.objectNode()
    def key(t: Term): String = if (t.isBNode) "_:" + t.lex else t.lex
    triples.groupBy(t => key(t.s)).toSeq.sortBy(_._1).foreach { case (sk, ts) =>
      val sObj: ObjectNode = f.objectNode()
      ts.groupBy(_.p.lex).toSeq.sortBy(_._1).foreach { case (pk, pts) =>
        val arr: ArrayNode = f.arrayNode()
        pts.map(_.o).distinct.foreach { o =>
          val on = f.objectNode()
          if (o.isIri) { on.put("type", "uri"); on.put("value", o.lex) }
          else if (o.isBNode) { on.put("type", "bnode"); on.put("value", "_:" + o.lex) }
          else {
            on.put("type", "literal"); on.put("value", o.lex)
            if (o.lang.nonEmpty) on.put("lang", o.lang)
            else if (o.dt.nonEmpty && o.dt != Term.XSD_STRING)
              on.put("datatype", o.dt)
          }
          arr.add(on)
        }
        sObj.set[JsonNode](pk, arr)
      }
      root.set[JsonNode](sk, sObj)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}
