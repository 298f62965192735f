package graft.riot

import scala.collection.mutable.ListBuffer

import graft.model.{Term, Triple}
import graft.normalize.{Iri, Literals}

/**
 * Constrained RDF/XML reader for the golden gate's reference data files
 * (reference: jena-core RRX/ARP parsers — full RDF/XML stays out of scope,
 * SURVEY §7.4; the W3C test fixtures use only the basic striped syntax).
 * Supported: rdf:RDF roots, rdf:Description + typed node elements,
 * rdf:about/rdf:ID/rdf:nodeID, property elements with rdf:resource /
 * rdf:nodeID / rdf:datatype / inherited xml:lang / nested node elements /
 * rdf:parseType="Resource", and property attributes. Driver-side by
 * design: test fixtures are tiny documents.
 */
object RdfXmlLite {

  private val RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  def parse(xml: String, base: String): Seq[Triple] = {
    val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(true)
    val doc = factory.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val out = ListBuffer[Triple]()
    var bn = 0
    def freshBnode(): Term = { bn += 1; Term.bnode(s"rx$bn") }

    def childElems(e: org.w3c.dom.Element): Seq[org.w3c.dom.Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).map(nl.item)
        .collect { case x: org.w3c.dom.Element => x }
    }
    def attr(e: org.w3c.dom.Element, local: String): Option[String] = {
      val v = e.getAttributeNS(RDFNS, local)
      if (v == null || v.isEmpty) {
        if (e.hasAttributeNS(RDFNS, local)) Some("") else None
      } else Some(v)
    }
    def langOf(e: org.w3c.dom.Element, inherited: String): String = {
      val l = e.getAttribute("xml:lang")
      if (l != null && l.nonEmpty) l else inherited
    }

    /** A node element (rdf:Description or typed). Returns its subject. */
    def nodeElem(e: org.w3c.dom.Element, lang0: String): Term = {
      val lang = langOf(e, lang0)
      val subj =
        attr(e, "about").map(a => Term.iri(Iri.resolve(base, a)))
          .orElse(attr(e, "ID").map(id => Term.iri(Iri.resolve(base, "#" + id))))
          .orElse(attr(e, "nodeID").map(Term.bnode))
          .getOrElse(freshBnode())
      // typed node element: the element name is an rdf:type triple
      if (!(e.getNamespaceURI == RDFNS && e.getLocalName == "Description"))
        out += Triple(subj, Term.iri(RDFNS + "type"),
          Term.iri(e.getNamespaceURI + e.getLocalName))
      // property ATTRIBUTES (non-rdf, non-xml) are string-literal triples
      val attrs = e.getAttributes
      (0 until attrs.getLength).map(attrs.item)
        .collect { case a: org.w3c.dom.Attr => a }
        .filter { a =>
          val ns = Option(a.getNamespaceURI).getOrElse("")
          ns != RDFNS && !ns.startsWith("http://www.w3.org/XML/") &&
            ns.nonEmpty && !a.getName.startsWith("xmlns")
        }
        .foreach { a =>
          out += Triple(subj, Term.iri(a.getNamespaceURI + a.getLocalName),
            Term.string(a.getValue))
        }
      childElems(e).foreach(propertyElem(subj, _, lang))
      subj
    }

    /** A property element under subject `subj`. */
    def propertyElem(subj: Term, p: org.w3c.dom.Element, lang0: String): Unit = {
      val lang = langOf(p, lang0)
      val pred = Term.iri(p.getNamespaceURI + p.getLocalName)
      val kids = childElems(p)
      val parseType = attr(p, "parseType")
      val obj: Term =
        attr(p, "resource") match {
          case Some(r) => Term.iri(Iri.resolve(base, r))
          case None => attr(p, "nodeID") match {
            case Some(nid) => Term.bnode(nid)
            case None if parseType.contains("Resource") =>
              val b = freshBnode()
              kids.foreach(propertyElem(b, _, lang))
              b
            case None if kids.nonEmpty => nodeElem(kids.head, lang)
            case None =>
              val text = p.getTextContent
              attr(p, "datatype") match {
                case Some(dt) => Term.lit(Literals.canonLiteral(text, dt), dt)
                case None if lang.nonEmpty => Term.langLit(text, lang)
                case None => Term.string(text)
              }
          }
        }
      out += Triple(subj, pred, obj)
    }

    val root = doc.getDocumentElement
    val tops =
      if (root.getNamespaceURI == RDFNS && root.getLocalName == "RDF")
        childElems(root)
      else Seq(root)
    tops.foreach(nodeElem(_, ""))
    out.toList
  }
}
