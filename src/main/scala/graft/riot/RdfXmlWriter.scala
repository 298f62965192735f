package graft.riot

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Term

/**
 * RDF/XML writer — the "plain" / one-Description-per-subject form
 * (reference: jena-core rdfxml/xmloutput/impl/RDFXML_Basic.java +
 * BaseXMLWriter.java; Jena calls it RDFXML_PLAIN). Closes the writer
 * matrix: every reader format (NT, NQ, Turtle, TriG, TriX, RDF/JSON,
 * JSON-LD, Thrift, Protobuf, RDF/XML) now has a writer.
 *
 * Distribution shape (same discipline as [[TurtleWriter]]): one
 * groupBy(subject) shuffle, then each output PARTITION emits a complete,
 * standalone RDF/XML document (XML requires a single root element, so —
 * unlike Turtle — part files do not concatenate; each part is its own
 * valid document, which is exactly how the splittable readers consume
 * them: one document per file).
 *
 * Faithfulness notes:
 *  - Predicate IRIs split into namespace + XML-NCName local part exactly
 *    like the reference (Util.splitNamespaceXML: MAXIMAL NCName suffix);
 *    an IRI with no valid split (ends in '/' etc.) throws, as Jena's
 *    writer does ("Unable to serialize"). Namespaces are declared inline
 *    on each property element — verbose but streaming-friendly (no
 *    whole-dataset namespace scan before the first byte).
 *  - bnode labels that are not NCNames are deterministically relabeled
 *    ("n" + hex); RDF/XML's rdf:nodeID value space is NCName-only and
 *    bnode identity is file-scoped anyway (round-trip is isomorphic).
 *  - RDF 1.2: triple-term objects emit rdf:parseType="Triple",
 *    dir-lang literals emit xml:lang + its:dir — the root always declares
 *    rdf:version="1.2" + xmlns:its so those features are in scope
 *    (harmless for 1.1-only content; RdfXmlLite treats version as a
 *    feature gate, not a dialect switch).
 *  - rdf:XMLLiteral emits the rdf:datatype-attribute form with escaped
 *    text (NOT rdf:parseType="Literal"): parseType Literal re-serializes
 *    through the reader's xmlLiteral path, which injects in-scope xmlns
 *    declarations into the lexical form — the datatype form is the one
 *    that round-trips the lexical form byte-exactly.
 */
object RdfXmlWriter {

  private val RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val ITSNS = "http://www.w3.org/2005/11/its"

  // ---- XML escaping (BaseXMLWriter's Util.substituteEntitiesInElementContent).
  // \r MUST be a char ref even in element content: XML parsers normalize
  // raw \r / \r\n to \n (XML 1.0 §2.11), which would corrupt the lexical
  // form on round-trip. In attributes, \n and \t are additionally
  // normalized to spaces (§3.3.3) — char refs survive both.
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\r", "&#13;")
  private def escAttr(s: String): String =
    esc(s).replace("\"", "&quot;").replace("\n", "&#10;").replace("\t", "&#9;")

  // ---- NCName (XML-Names §3, the ASCII+letter pragmatic subset the
  // reader's validNCName accepts)
  private def ncStart(c: Char): Boolean = c == '_' || Character.isLetter(c)
  private def ncChar(c: Char): Boolean =
    ncStart(c) || c == '-' || c == '.' || Character.isDigit(c)
  private def isNCName(s: String): Boolean =
    s.nonEmpty && ncStart(s.head) && s.forall(ncChar)

  /** Maximal-NCName-suffix split of a predicate IRI into (namespace,
   * localname) — Util.splitNamespaceXML. Throws when no suffix is a valid
   * NCName (Jena: "Unable to serialize"). */
  private[graft] def splitIri(iri: String): (String, String) = {
    var i = iri.length - 1
    if (i < 0 || !ncChar(iri(i)))
      throw new IllegalArgumentException(
        s"RDF/XML: cannot serialize predicate <$iri> (no NCName local part)")
    var split = -1
    while (i >= 0 && ncChar(iri(i))) {
      if (ncStart(iri(i))) split = i
      i -= 1
    }
    if (split <= 0)
      throw new IllegalArgumentException(
        s"RDF/XML: cannot serialize predicate <$iri> (empty namespace)")
    (iri.substring(0, split), iri.substring(split))
  }

  private def bnodeId(label: String): String =
    if (isNCName(label)) label
    else "n" + label.getBytes("UTF-8").map(b => f"$b%02x").mkString

  /** One property element (two-space base indent inside a Description). */
  private def propertyXml(p: Term, o: Term, sb: StringBuilder, indent: String): Unit = {
    val (ns, local) = splitIri(p.lex)
    val open = s"""$indent<ns:$local xmlns:ns="${escAttr(ns)}""""
    o.kind match {
      case Term.KIND_IRI =>
        sb.append(s"""$open rdf:resource="${escAttr(o.lex)}"/>\n""")
      case Term.KIND_BNODE =>
        sb.append(s"""$open rdf:nodeID="${bnodeId(o.lex)}"/>\n""")
      case Term.KIND_TRIPLE_TERM =>
        NTriples.parseTripleTermComponents(o.lex) match {
          case Some((ts, tp, to)) =>
            sb.append(s"""$open rdf:parseType="Triple">\n""")
            descriptionXml(ts, Seq(tp -> to), sb, indent + "  ")
            sb.append(s"$indent</ns:$local>\n")
          case None =>
            throw new IllegalArgumentException(
              s"RDF/XML: unparseable triple term: ${o.lex}")
        }
      case _ => // literal
        if (o.lang.nonEmpty) {
          // dir-lang literals carry "lang--dir" in the lang slot
          val (lang, dir) = o.lang.indexOf("--") match {
            case -1 => (o.lang, "")
            case k  => (o.lang.substring(0, k), o.lang.substring(k + 2))
          }
          val dirAttr = if (dir.nonEmpty) s""" its:dir="$dir"""" else ""
          sb.append(s"""$open xml:lang="${escAttr(lang)}"$dirAttr>${esc(o.lex)}</ns:$local>\n""")
        } else if (o.dt.isEmpty || o.dt == Term.XSD_STRING)
          sb.append(s"$open>${esc(o.lex)}</ns:$local>\n")
        else
          sb.append(s"""$open rdf:datatype="${escAttr(o.dt)}">${esc(o.lex)}</ns:$local>\n""")
    }
  }

  private def descriptionXml(s: Term, pos: Seq[(Term, Term)],
      sb: StringBuilder, indent: String): Unit = {
    val about = s.kind match {
      case Term.KIND_IRI   => s"""rdf:about="${escAttr(s.lex)}""""
      case Term.KIND_BNODE => s"""rdf:nodeID="${bnodeId(s.lex)}""""
      case _ => throw new IllegalArgumentException(
        s"RDF/XML: subject must be an IRI or bnode, got kind ${s.kind}")
    }
    sb.append(s"$indent<rdf:Description $about>\n")
    pos.foreach { case (p, o) => propertyXml(p, o, sb, indent + "  ") }
    sb.append(s"$indent</rdf:Description>\n")
  }

  private val docOpen: String =
    s"""<?xml version="1.0" encoding="UTF-8"?>\n""" +
      s"""<rdf:RDF xmlns:rdf="$RDFNS" xmlns:its="$ITSNS" rdf:version="1.2">\n"""
  private val docClose: String = "</rdf:RDF>"

  /** Whole-document RDF/XML text (result documents, tests — the
   * document-level sibling, like TriX.write). */
  def write(triples: Seq[graft.model.Triple]): String = {
    val sb = new StringBuilder(docOpen)
    triples.groupBy(_.s).toSeq.sortBy(_._1.toNTriples).foreach { case (s, ts) =>
      descriptionXml(s, ts.sortBy(t => (t.p.toNTriples, t.o.toNTriples)).map(t => t.p -> t.o),
        sb, "  ")
    }
    sb.append(docClose).append("\n")
    sb.toString
  }

  /** Distributed: one standalone RDF/XML document string per PARTITION
   * from an (s,p,o) term-struct DataFrame. Write with
   * `.write.text(path)` — one document per part file. */
  def format(triples: DataFrame): Dataset[String] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val grouped = triples
      .groupBy(col("s"))
      .agg(sort_array(collect_list(
        struct(col("p").as("_1"), col("o").as("_2")))).as("pos"))
      .select(col("s").as("_1"), col("pos").as("_2"))
      .as[(Term, Seq[(Term, Term)])]
    grouped.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val sb = new StringBuilder(docOpen)
        it.foreach { case (s, pos) => descriptionXml(s, pos, sb, "  ") }
        sb.append(docClose)
        Iterator.single(sb.toString)
      }
    }
  }

  def writeDistributed(triples: DataFrame, path: String): Unit =
    format(triples).write.mode("overwrite").text(path)
}
