package graft.model

/**
 * RDF term ADT — the Spark-native equivalent of Jena's `Node` hierarchy
 * (reference: jena-core/src/main/java/org/apache/jena/graph/Node.java:52 and
 * NodeFactory.java:52–320). Encoded as a flat case class so Spark's product
 * encoder yields a stable 4-field struct column `(kind, lex, dt, lang)` that
 * survives shuffles and is cheap to compare (plain struct equality).
 *
 * kind: 0 = IRI, 1 = blank node, 2 = literal, 3 = triple term (RDF 1.2,
 * encoded as canonical N-Triples text in `lex` — Spark schemas cannot
 * recurse, see SURVEY.md §1.7).
 *
 * Conventions (chosen so that value-equality == string-equality after the
 * normalize stage, mirroring GraphMemValue semantics —
 * jena-core/src/main/java/org/apache/jena/graph/GraphMemFactory.java:76–93):
 *  - IRI:     lex = the IRI string, dt = "", lang = ""
 *  - BNode:   lex = label (no "_:" prefix), dt = "", lang = ""
 *  - Literal: lex = lexical form, dt = full datatype IRI ("" means xsd:string),
 *             lang = canonical language tag ("" if none)
 */
final case class Term(kind: Byte, lex: String, dt: String, lang: String) {
  def isIri: Boolean = kind == Term.KIND_IRI
  def isBNode: Boolean = kind == Term.KIND_BNODE
  def isLiteral: Boolean = kind == Term.KIND_LIT

  /** Canonical N-Triples rendering — mirrors the reference's NodeFormatterNT
   * (jena-arq/src/main/java/org/apache/jena/riot/out/NodeFormatterNT.java and
   * NodeFmtLib.java): IRIs in <>, bnodes as _:label, literals with escaped
   * lexical form plus @lang or ^^<dt> (xsd:string datatype omitted). */
  def toNTriples: String = kind match {
    case Term.KIND_IRI   => "<" + lex + ">"
    case Term.KIND_BNODE => "_:" + lex
    case Term.KIND_TRIPLE_TERM => lex // already canonical "<<( s p o )>>"
    case _ =>
      val sb = new StringBuilder("\"")
      NTriplesEscape.escapeInto(lex, sb)
      sb.append('"')
      if (lang.nonEmpty) sb.append('@').append(lang)
      else if (dt.nonEmpty && dt != Term.XSD_STRING) sb.append("^^<").append(dt).append('>')
      sb.toString
  }
}

object Term {
  val KIND_IRI: Byte = 0
  val KIND_BNODE: Byte = 1
  val KIND_LIT: Byte = 2
  val KIND_TRIPLE_TERM: Byte = 3

  val XSD = "http://www.w3.org/2001/XMLSchema#"
  val XSD_STRING: String = XSD + "string"
  val XSD_INTEGER: String = XSD + "integer"
  val XSD_DECIMAL: String = XSD + "decimal"
  val XSD_DOUBLE: String = XSD + "double"
  val XSD_FLOAT: String = XSD + "float"
  val XSD_BOOLEAN: String = XSD + "boolean"
  val XSD_DATETIME: String = XSD + "dateTime"
  val RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  /** Reserved default-graph IRI (reference: sparql/core/Quad.java:40). */
  val DEFAULT_GRAPH = "urn:x-arq:DefaultGraph"

  def iri(s: String): Term = Term(KIND_IRI, s, "", "")
  def bnode(label: String): Term = Term(KIND_BNODE, label, "", "")
  def string(lex: String): Term = Term(KIND_LIT, lex, XSD_STRING, "")
  def lit(lex: String, dt: String): Term = Term(KIND_LIT, lex, dt, "")
  /** RFC 5646 language-tag case canonicalization (the reference's rule,
   * InternalLangTag.java:62–70): first subtag lower; later subtags: 2
   * chars → UPPER (region), 4 chars → Titlecase (script), else lower.
   * Applied on CONSTRUCTION so language tags — case-insensitive per RDF
   * 1.1 — compare equal as plain strings everywhere ("xyz"@EN == "xyz"@en,
   * term equality included). graft.normalize.LangTags delegates here. */
  def canonLangTag(tag: String): String = {
    if (tag == null || tag.isEmpty) return tag
    tag.split("-", -1).zipWithIndex.map { case (p, k) =>
      if (k == 0) p.toLowerCase
      else if (p.length == 2) p.toUpperCase
      else if (p.length == 4) p.substring(0, 1).toUpperCase + p.substring(1).toLowerCase
      else p.toLowerCase
    }.mkString("-")
  }

  def langLit(lex: String, lang: String): Term =
    Term(KIND_LIT, lex, RDF_LANGSTRING, canonLangTag(lang))
  def defaultGraph: Term = iri(DEFAULT_GRAPH)
}

/** A triple of terms — the one "row type" of the whole engine
 * (reference: jena-core/src/main/java/org/apache/jena/graph/Triple.java:38). */
final case class Triple(s: Term, p: Term, o: Term) {
  def toNTriples: String = s.toNTriples + " " + p.toNTriples + " " + o.toNTriples + " ."
}

/** A quad: triple + graph name (reference: sparql/core/Quad.java:35).
 * `g == Term.defaultGraph` marks the default graph; N-Quads lines for it
 * omit the fourth term. */
final case class Quad(s: Term, p: Term, o: Term, g: Term) {
  def toNQuads: String =
    if (g.lex == Term.DEFAULT_GRAPH)
      s.toNTriples + " " + p.toNTriples + " " + o.toNTriples + " ."
    else
      s.toNTriples + " " + p.toNTriples + " " + o.toNTriples + " " + g.toNTriples + " ."
  def triple: Triple = Triple(s, p, o)
}

/** N-Triples string escaping per the reference's EscapeStr/NodeFmtLib rules
 * (jena-arq/src/main/java/org/apache/jena/riot/out/quoted/QuotedStringOutputNT). */
object NTriplesEscape {
  def escapeInto(s: String, sb: StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < 0x20 || c == 0x7f => sb.append(f"\\u${c.toInt}%04X")
        case _ => sb.append(c)
      }
      i += 1
    }
  }
  def escape(s: String): String = {
    val sb = new StringBuilder; escapeInto(s, sb); sb.toString
  }

  /** Inverse of escape — for parsing canonical N-Triples fixtures. */
  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case '"'  => sb.append('"'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'u' if i + 2 < s.length && s.charAt(i + 2) == '{' =>
            // delimited codepoint escape \u{1..6 hex} (ARQ / RDF 1.2 draft)
            val close = s.indexOf('}', i + 3)
            require(close > i + 2, s"unterminated \\u{ escape in '$s'")
            sb.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 3, close), 16)))
            i = close + 1
          case 'u'  => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'U'  =>
            sb.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
