package graft.riot

import java.io.ByteArrayInputStream

import scala.collection.mutable

import org.w3c.dom.{Element, Node}

import graft.model.{Quad, Term}

/**
 * TriX reader/writer — RDF quads in XML (reference:
 * jena-arq/src/main/java/org/apache/jena/riot/lang/ReaderTriX.java and
 * writer/WriterTriX.java; format: HPL-2004-56). Strict per the
 * reference's fixture suite (testing/RIOT/Lang/TriX): root TriX/trix in
 * the trix-1 namespace, graphs with an optional leading <uri>/<id> name,
 * triples of exactly three terms (uri | id | plainLiteral@xml:lang |
 * typedLiteral@datatype | nested triple = RDF 1.2 triple term, object
 * position only), rdf:XMLLiteral lexical forms preserved as the inner
 * XML text. Documents are whole-file row payloads in the pipeline (one
 * TriX document per `content` cell), so the reader is a pure
 * String → Seq[Quad] function usable inside mapPartitions.
 */
object TriX {
  val NS = "http://www.w3.org/2004/03/trix/trix-1/"
  private val XML_LITERAL =
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral"

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("TriX: " + msg)

  def parse(xml: String): Seq[Quad] = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // zero-egress: never fetch external DTDs
    f.setFeature(
      "http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    val doc = f.newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes("UTF-8")))
    val root = doc.getDocumentElement
    // two dialects: namespaced (HPL-2004-56) and the W3C DTD variant
    // with no namespace (reference: ReaderTriX accepts both)
    def nsOk(e: Element): Boolean =
      e.getNamespaceURI == NS || e.getNamespaceURI == null
    def local(e: Element): String =
      if (e.getLocalName != null) e.getLocalName else e.getTagName
    if (!nsOk(root) || local(root).toLowerCase != "trix")
      fail(s"root must be <TriX> in <$NS>, got " +
        s"{${root.getNamespaceURI}}${local(root)}")

    def childElems(e: Element): Seq[Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).map(nl.item).collect { case c: Element => c }
    }

    /** Serialize an element's CHILD nodes as they appeared in the source
     * (XMLLiteral lexical forms): only attributes literally present are
     * emitted — a Transformer would ADD inherited xmlns declarations,
     * which the reference's expected forms do not carry (trix-12). */
    def innerXml(e: Element): String = {
      val sb = new StringBuilder
      def escText(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      def walk(n: Node): Unit = n.getNodeType match {
        case Node.ELEMENT_NODE =>
          val el = n.asInstanceOf[Element]
          sb.append('<').append(el.getTagName)
          val atts = el.getAttributes
          (0 until atts.getLength).foreach { i =>
            val a = atts.item(i)
            sb.append(' ').append(a.getNodeName).append("=\"")
              .append(a.getNodeValue.replace("&", "&amp;")
                .replace("<", "&lt;").replace("\"", "&quot;"))
              .append('"')
          }
          val kids = el.getChildNodes
          if (kids.getLength == 0) sb.append("/>")
          else {
            sb.append('>')
            (0 until kids.getLength).foreach(k => walk(kids.item(k)))
            sb.append("</").append(el.getTagName).append('>')
          }
        case Node.TEXT_NODE => sb.append(escText(n.getNodeValue))
        case Node.CDATA_SECTION_NODE =>
          sb.append("<![CDATA[").append(n.getNodeValue).append("]]>")
        case Node.COMMENT_NODE =>
          sb.append("<!--").append(n.getNodeValue).append("-->")
        case _ => ()
      }
      val nl = e.getChildNodes
      (0 until nl.getLength).foreach(k => walk(nl.item(k)))
      sb.toString
    }

    def term(e: Element): Term = {
      if (!nsOk(e)) fail(s"term element outside trix ns: ${e.getTagName}")
      local(e) match {
        case "uri" => Term.iri(e.getTextContent.trim)
        case "qname" =>
          // resolve against in-scope xmlns declarations (trix-ns-*)
          val q = e.getTextContent.trim
          val i = q.indexOf(':')
          val (pre, loc) =
            if (i < 0) (null, q) else (q.substring(0, i), q.substring(i + 1))
          val ns = e.lookupNamespaceURI(pre)
          if (ns == null) fail(s"unbound qname prefix in '$q'")
          Term.iri(ns + loc)
        case "id" => Term.bnode(e.getTextContent.trim)
        case "plainLiteral" =>
          val lang = e.getAttributeNS("http://www.w3.org/XML/1998/namespace", "lang")
          if (lang == null || lang.isEmpty) Term.string(e.getTextContent)
          else Term.langLit(e.getTextContent, lang)
        case "typedLiteral" =>
          val dt = e.getAttribute("datatype")
          if (dt == null || dt.isEmpty) fail("typedLiteral without @datatype")
          if (dt == XML_LITERAL) Term.lit(innerXml(e), dt)
          else Term.lit(e.getTextContent, dt)
        case "triple" => // RDF 1.2 triple term (nested)
          val t = tripleOf(e)
          Term(Term.KIND_TRIPLE_TERM,
            "<<( " + t._1.toNTriples + " " + t._2.toNTriples + " " +
              t._3.toNTriples + " )>>", "", "")
        case other => fail(s"unknown term element <$other>")
      }
    }

    def tripleOf(e: Element): (Term, Term, Term) = {
      val kids = childElems(e)
      if (kids.size != 3) fail(s"<triple> needs exactly 3 terms, got ${kids.size}")
      val s = term(kids(0)); val p = term(kids(1)); val o = term(kids(2))
      if (s.isLiteral || s.kind == Term.KIND_TRIPLE_TERM)
        fail("triple subject must be a URI or blank node")
      if (!p.isIri) fail("triple predicate must be a URI")
      (s, p, o)
    }

    val out = mutable.Buffer[Quad]()
    childElems(root).foreach { g =>
      if (!nsOk(g) || local(g) != "graph")
        fail(s"expected <graph>, got <${g.getTagName}>")
      val kids = childElems(g)
      // optional leading graph name (uri or id); everything after the
      // first <triple> must be a <triple>
      val (nameElems, tripleElems) = kids.span(e =>
        nsOk(e) && (local(e) == "uri" || local(e) == "id" || local(e) == "qname"))
      if (nameElems.size > 1) fail("graph has more than one name")
      val gname = nameElems.headOption.map(term).getOrElse(Term.defaultGraph)
      tripleElems.foreach { t =>
        if (!nsOk(t) || local(t) != "triple")
          fail(s"expected <triple>, got <${t.getTagName}>")
        val (s, p, o) = tripleOf(t)
        out += Quad(s, p, o, gname)
      }
    }
    out.toSeq.distinct
  }

  // -------------------------------------------------------------- writer

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  private def escAttr(s: String): String = esc(s).replace("\"", "&quot;")

  private def termXml(t: Term, sb: StringBuilder, indent: String): Unit = t.kind match {
    case Term.KIND_IRI => sb.append(s"$indent<uri>${esc(t.lex)}</uri>\n")
    case Term.KIND_BNODE => sb.append(s"$indent<id>${esc(t.lex)}</id>\n")
    case Term.KIND_TRIPLE_TERM =>
      NTriples.parseTripleTermComponents(t.lex) match {
        case Some((s, p, o)) =>
          sb.append(s"$indent<triple>\n")
          termXml(s, sb, indent + "  "); termXml(p, sb, indent + "  ")
          termXml(o, sb, indent + "  ")
          sb.append(s"$indent</triple>\n")
        case None => fail(s"unparseable triple term: ${t.lex}")
      }
    case _ =>
      if (t.lang.nonEmpty)
        sb.append(s"""$indent<plainLiteral xml:lang="${escAttr(t.lang)}">${esc(t.lex)}</plainLiteral>\n""")
      else if (t.dt.isEmpty || t.dt == Term.XSD_STRING)
        sb.append(s"$indent<plainLiteral>${esc(t.lex)}</plainLiteral>\n")
      else if (t.dt == XML_LITERAL)
        // XMLLiteral lexical forms ARE xml — emitted verbatim
        sb.append(s"""$indent<typedLiteral datatype="${escAttr(t.dt)}">${t.lex}</typedLiteral>\n""")
      else
        sb.append(s"""$indent<typedLiteral datatype="${escAttr(t.dt)}">${esc(t.lex)}</typedLiteral>\n""")
  }

  def write(quads: Seq[Quad]): String = {
    val sb = new StringBuilder
    sb.append(s"""<TriX xmlns="$NS">\n""")
    quads.groupBy(_.g).toSeq.sortBy(_._1.lex).foreach { case (g, qs) =>
      sb.append("  <graph>\n")
      if (g.lex != Term.DEFAULT_GRAPH) termXml(g, sb, "    ")
      qs.foreach { q =>
        sb.append("    <triple>\n")
        termXml(q.s, sb, "      ")
        termXml(q.p, sb, "      ")
        termXml(q.o, sb, "      ")
        sb.append("    </triple>\n")
      }
      sb.append("  </graph>\n")
    }
    sb.append("</TriX>\n")
    sb.toString
  }
}
