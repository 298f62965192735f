package graft.riot

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model.{Quad, Term, Triple}

/**
 * JSON-LD 1.1-core reader/writer — the format the reference serves through
 * its jsonld adapter (jena-arq/src/main/java/org/apache/jena/riot/lang/
 * LangJSONLD11.java, which delegates expansion/toRDF to titanium-json-ld;
 * fixtures under jena-arq/testing/RIOT/jsonld and jsonld11).
 * This is an independent implementation of the subset those fixtures and
 * common LD documents exercise, written against the public JSON-LD 1.1
 * spec (W3C REC, Expansion + Deserialize-to-RDF algorithms):
 *
 *   @context: inline objects and ARRAYS of objects (merged left-to-right),
 *     term definitions as plain IRI strings or objects with @id / @type
 *     (coercion: "@id", "@vocab", or a datatype IRI) / @language /
 *     @container ("@list", "@set") / @reverse / scoped @context /
 *     keyword ALIASES ("id": "@id"); prefix terms (compact IRIs p:x);
 *     @vocab, @base, default @language, @version (accepted, ignored);
 *     term removal via null.
 *   node objects: @id (IRI / _:label / relative-vs-@base), @type (vocab
 *     expansion, arrays), nested node objects (fresh bnodes), arrays as
 *     multi-values, @reverse maps, @graph (top-level = default graph;
 *     with @id = that named graph; anonymous nested = bnode graph name),
 *     @index/@version ignored, null values dropped, keys that expand to
 *     no IRI dropped (spec behavior).
 *   values: value objects {@value, @type|@language|@direction}, native
 *     JSON types (integral → xsd:integer, fractional → xsd:double in
 *     canonical exponent form, booleans), strings under coercion
 *     (@id/@vocab → IRI term, datatype → typed literal, term/default
 *     @language → langString, else xsd:string), @list (rdf:first/rest
 *     chains, rdf:nil) and @set, @json literals (rdf:JSON).
 *
 * Remote contexts (string @context values = URLs) raise: the engine is
 * zero-egress by design; the reference's loader fetches them.
 *
 * Parsing is pure per document — a JSON-LD doc is one JSON value, not
 * line-splittable — so the distributed read path is whole-file-per-task
 * (`spark.read.option("wholetext", true)`) + mapPartitions, the same
 * shape as RdfXmlLite's (SURVEY.md §2.1).
 */
object JsonLd {

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  private val keywords = Set(
    "@context", "@id", "@type", "@value", "@language", "@direction",
    "@list", "@set", "@graph", "@reverse", "@base", "@vocab", "@index",
    "@version", "@json", "@nest", "@none", "@container", "@protected",
    "@propagate", "@included")

  /** One term definition from an @context. `iri` may itself be a keyword
   * when the term is a keyword alias ("id": "@id"). */
  private final case class TermDef(
      iri: String,
      typeCoercion: String = "", // "@id" | "@vocab" | datatype IRI | ""
      language: Option[String] = None, // Some("") = clear default language
      container: String = "", // "@list" | "@set" | ""
      reverse: Boolean = false,
      scoped: Option[JsonNode] = None)

  private final case class Ctx(
      terms: Map[String, TermDef],
      vocab: String,
      base: String,
      defaultLang: String)

  def parse(content: String, baseIri: String = "", scope: String = ""): Seq[Quad] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(content)
    val st = new State(baseIri, scope)
    val ctx0 = Ctx(Map.empty, "", baseIri, "")
    root match {
      case a if a.isArray =>
        // the "only @graph = default graph" collapse (expansion step 19)
        // applies to a single top-level MAP, not to array members: an
        // anonymous {"@graph":…} inside an array names a bnode graph.
        a.elements().asScala.foreach(n => st.node(n, ctx0, Term.defaultGraph))
      case o if o.isObject =>
        st.node(o, ctx0, Term.defaultGraph, topLevel = true)
      case _ => throw new IllegalArgumentException(
        "JSON-LD document must be an object or an array of node objects")
    }
    st.out.toSeq
  }

  /** Default-graph triple view (single-graph documents). */
  def parseTriples(content: String, baseIri: String = ""): Seq[Triple] =
    parse(content, baseIri).collect {
      case q if q.g.lex == Term.DEFAULT_GRAPH => q.triple
    }

  /** Distributed read: one whole JSON-LD document per file → quads. The
   * parse is pure per document, so this is a narrow mapPartitions over
   * whole-file splits; per-document bnode scopes keep labels from
   * colliding across files. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String,
      baseIri: String = ""): org.apache.spark.sql.Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", value = true).textFile(path)
      .mapPartitions(_.map { doc =>
        parse(doc, baseIri,
          scope = java.lang.Integer.toHexString(
            scala.util.hashing.MurmurHash3.stringHash(doc)) + "-")
      }.flatten)
  }

  // ---------------------------------------------------------------- state

  private final class State(baseIri: String, scope: String = "") {
    val out = mutable.ListBuffer[Quad]()
    private var bnodeN = 0
    /** doc label → stable fresh label, shared across the whole document
     * (graph names included) like the reference's LabelToNode map. `scope`
     * keeps labels from distinct documents apart in a multi-file read. */
    private val bnodeMap = mutable.Map[String, String]()

    def freshBnode(): Term = { bnodeN += 1; Term.bnode(s"${scope}jb$bnodeN") }

    def docBnode(label: String): Term =
      Term.bnode(bnodeMap.getOrElseUpdate(label, { bnodeN += 1; s"${scope}jb$bnodeN" }))

    def emit(s: Term, p: Term, o: Term, g: Term): Unit = out += Quad(s, p, o, g)

    // ------------------------------------------------------------ context

    def parseContext(node: JsonNode, parent: Ctx): Ctx = node match {
      case n if n == null || n.isNull =>
        Ctx(Map.empty, "", baseIri, "") // null = reset to initial context
      case a if a.isArray =>
        a.elements().asScala.foldLeft(parent)((c, e) => parseContext(e, c))
      case s if s.isTextual =>
        throw new IllegalArgumentException(
          s"remote @context not supported (zero-egress): ${s.asText}")
      case o if o.isObject =>
        var vocab = parent.vocab
        var base = parent.base
        var lang = parent.defaultLang
        val raw = o.properties().asScala.map(e => e.getKey -> e.getValue).toMap
        raw.get("@vocab").foreach(v => vocab = if (v.isNull) "" else v.asText)
        raw.get("@base").foreach(v =>
          base = if (v.isNull) "" else graft.normalize.Iri.resolve(parent.base, v.asText))
        raw.get("@language").foreach(v => lang = if (v.isNull) "" else v.asText)
        // term definitions resolve lazily (a def may reference another
        // prefix defined in the SAME object) with a cycle guard.
        val defs = mutable.Map[String, TermDef]()
        val removed = mutable.Set[String]()
        val inProgress = mutable.Set[String]()
        lazy val interim: () => Ctx =
          () => Ctx(parent.terms -- removed ++ defs, vocab, base, lang)
        def define(term: String): Unit = {
          if (defs.contains(term) || removed.contains(term)) return
          if (inProgress.contains(term))
            throw new IllegalArgumentException(s"cyclic @context term: $term")
          inProgress += term
          val v = raw(term)
          if (v == null || v.isNull) removed += term
          else if (v.isTextual) {
            val t = v.asText
            defs(term) =
              if (t.startsWith("@")) TermDef(t)
              else TermDef(expandDefValue(t, interim(), raw, define))
          } else if (v.isObject) {
            val idN = Option(v.get("@id"))
            val iri = idN match {
              case Some(n) if n.isTextual =>
                val t = n.asText
                if (t.startsWith("@")) t
                else expandDefValue(t, interim(), raw, define)
              case _ =>
                // no @id: term expands via @vocab (or is a pure scoped-
                // context carrier like doc-3's "term")
                if (vocab.nonEmpty) vocab + term else term
            }
            val tc = Option(v.get("@type")).map { n =>
              val t = n.asText
              if (t == "@id" || t == "@vocab" || t == "@json") t
              else expandDefValue(t, interim(), raw, define)
            }.getOrElse("")
            val lg = Option(v.get("@language"))
              .map(n => if (n.isNull) "" else n.asText)
            val cont = Option(v.get("@container")).map { n =>
              if (n.isArray) n.elements().asScala.map(_.asText).toSeq.headOption.getOrElse("")
              else n.asText
            }.getOrElse("")
            val rev = Option(v.get("@reverse")).exists(_ => true)
            val iriR = Option(v.get("@reverse")).map { n =>
              expandDefValue(n.asText, interim(), raw, define)
            }.getOrElse(iri)
            defs(term) = TermDef(iriR, tc, lg, cont, rev,
              Option(v.get("@context")))
          }
          inProgress -= term
        }
        raw.keys.filterNot(_.startsWith("@")).foreach(define)
        Ctx(parent.terms -- removed ++ defs, vocab, base, lang)
      case other => throw new IllegalArgumentException(
        s"unsupported @context value: $other")
    }

    /** Expand a term-definition value (an IRI, compact IRI, or term),
     * resolving sibling prefixes in the same context object on demand. */
    private def expandDefValue(value: String, ctx: Ctx,
        raw: Map[String, JsonNode], define: String => Unit): String = {
      val c = value.indexOf(':')
      if (c > 0 && !value.substring(c + 1).startsWith("//")) {
        val pfx = value.substring(0, c)
        if (!ctx.terms.contains(pfx) && raw.contains(pfx)) define(pfx)
      }
      expandIri(value, ctx, vocabMode = true) match {
        case Some(iri) => iri
        case None => value
      }
    }

    /** IRI expansion (spec 5.2). vocabMode applies to keys, @type values
     * and term-def values; document-relative resolution otherwise. Returns
     * None when the value expands to no IRI (the key is then dropped). */
    def expandIri(value: String, ctx: Ctx, vocabMode: Boolean): Option[String] = {
      if (value.startsWith("@"))
        return if (keywords.contains(value)) Some(value) else None
      if (vocabMode) ctx.terms.get(value) match {
        case Some(td) => return Some(td.iri)
        case None =>
      }
      if (value.startsWith("_:")) return Some(value)
      val c = value.indexOf(':')
      if (c > 0) {
        val pfx = value.substring(0, c)
        val sfx = value.substring(c + 1)
        if (!sfx.startsWith("//")) ctx.terms.get(pfx) match {
          case Some(td) if !td.iri.startsWith("@") => return Some(td.iri + sfx)
          case _ =>
        }
        return Some(value) // absolute IRI (scheme:...)
      }
      if (vocabMode) {
        if (ctx.vocab.nonEmpty) Some(ctx.vocab + value) else None
      } else if (ctx.base.nonEmpty) {
        Some(graft.normalize.Iri.resolve(ctx.base, value))
      } else Some(value)
    }

    private def iriOrBnode(value: String, ctx: Ctx, vocabMode: Boolean = false): Term =
      if (value.startsWith("_:")) docBnode(value.substring(2))
      else Term.iri(expandIri(value, ctx, vocabMode).getOrElse(value))

    // --------------------------------------------------------------- node

    /** Process one node object; returns its subject term. */
    def node(obj: JsonNode, parentCtx: Ctx, graph: Term,
        topLevel: Boolean = false): Term = {
      if (!obj.isObject) throw new IllegalArgumentException(
        s"expected a node object, got: $obj")
      val ctx = Option(obj.get("@context"))
        .map(parseContext(_, parentCtx)).getOrElse(parentCtx)

      // resolve keyword aliases for this node's keys
      def kw(key: String): String =
        ctx.terms.get(key).map(_.iri).filter(_.startsWith("@")).getOrElse(key)

      val fields = obj.properties().asScala.map(e => e.getKey -> e.getValue).toSeq
      val idNode = fields.collectFirst { case (k, v) if kw(k) == "@id" => v }
      val subj = idNode match {
        case Some(n) if n.isTextual => iriOrBnode(n.asText, ctx)
        case _ => freshBnode()
      }

      fields.foreach { case (key, value) =>
        kw(key) match {
          case "@context" | "@id" | "@index" | "@version" | "@nest" => ()
          case "@type" =>
            val vals =
              if (value.isArray) value.elements().asScala.toSeq else Seq(value)
            vals.foreach { t =>
              emit(subj, Term.iri(RDF + "type"),
                iriOrBnode(t.asText, ctx, vocabMode = true), graph)
            }
          case "@graph" =>
            // top-level no-@id @graph = default graph; with a subject (or
            // nested anonymous) = named/bnode graph (toRDF 'graph name').
            val gName =
              if (topLevel && idNode.isEmpty) graph
              else subj
            val items =
              if (value.isArray) value.elements().asScala.toSeq else Seq(value)
            items.foreach(n => node(n, ctx, gName))
          case "@reverse" =>
            value.properties().asScala.foreach { e =>
              expandIri(e.getKey, ctx, vocabMode = true).foreach { pIri =>
                if (pIri.startsWith("@")) ()
                else {
                  val p = Term.iri(pIri)
                  setMembers(e.getValue).foreach { v =>
                    val o = valueTerm(v, TermDef(pIri), ctx, graph)
                    o.foreach(t => emit(t, p, subj, graph))
                  }
                }
              }
            }
          case kwd if kwd.startsWith("@") => () // ignored keyword
          case _ =>
            val td0 = ctx.terms.getOrElse(key, TermDef(""))
            expandIri(key, ctx, vocabMode = true) match {
              case None => () // key expands to no IRI: dropped (spec)
              case Some(pIri) if pIri.startsWith("@") => ()
              case Some(pIri) =>
                val td = td0.copy(iri = pIri)
                val ctxP = td.scoped.map(parseContext(_, ctx)).getOrElse(ctx)
                val p = Term.iri(pIri)
                def place(o: Term): Unit =
                  if (td.reverse) emit(o, p, subj, graph)
                  else emit(subj, p, o, graph)
                if (td.container == "@list" && value.isArray) {
                  place(listTerm(value.elements().asScala.toSeq, td, ctxP, graph))
                } else if (td.container == "@list" && !value.isNull &&
                    !(value.isObject && (value.has("@list") || value.has("@set")))) {
                  // a single (non-array) value under a @list container is
                  // wrapped as a one-element list (JSON-LD 1.1 expansion);
                  // explicit @list/@set value objects keep their own shape
                  place(listTerm(Seq(value), td, ctxP, graph))
                } else {
                  setMembers(value).foreach(
                    v => valueTerm(v, td, ctxP, graph).foreach(place))
                }
            }
        }
      }
      subj
    }

    /** Multi-value expansion of a value position: arrays AND transparent
     * {"@set": [...]} wrappers flatten to their members (one level each —
     * spec: @set disappears during expansion), so every member emits. */
    private def setMembers(value: JsonNode): Seq[JsonNode] = {
      val vs = if (value.isArray) value.elements().asScala.toSeq else Seq(value)
      vs.flatMap { v =>
        if (v != null && v.isObject && v.has("@set")) {
          val items = v.get("@set")
          if (items.isArray) items.elements().asScala.toSeq else Seq(items)
        } else Seq(v)
      }
    }

    /** One value position → an RDF term (None = null / dropped). */
    private def valueTerm(v: JsonNode, td: TermDef, ctx: Ctx,
        graph: Term): Option[Term] = v match {
      case n if n == null || n.isNull => None
      case n if n.isTextual =>
        val s = n.asText
        td.typeCoercion match {
          case "@id" | "@vocab" =>
            Some(iriOrBnode(s, ctx, vocabMode = td.typeCoercion == "@vocab"))
          case "" =>
            td.language.orElse(
              if (ctx.defaultLang.nonEmpty) Some(ctx.defaultLang) else None) match {
              case Some(l) if l.nonEmpty => Some(Term.langLit(s, l))
              case _ => Some(Term.string(s))
            }
          case dt => Some(Term.lit(s, dt))
        }
      case n if n.isNumber =>
        val dt =
          if (td.typeCoercion.nonEmpty && !td.typeCoercion.startsWith("@"))
            td.typeCoercion
          else if (n.isIntegralNumber) XSD + "integer"
          else XSD + "double"
        val lex =
          if (n.isIntegralNumber) n.bigIntegerValue.toString
          else canonicalDouble(n.asDouble)
        Some(Term.lit(lex, dt))
      case n if n.isBoolean =>
        Some(Term.lit(if (n.asBoolean) "true" else "false", XSD + "boolean"))
      case n if n.isObject && n.has("@list") =>
        val items = n.get("@list")
        val seq = if (items.isArray) items.elements().asScala.toSeq else Seq(items)
        Some(listTerm(seq, td.copy(container = ""), ctx, graph))
      case n if n.isObject && n.has("@set") =>
        // @set is transparent — multi-member sets are flattened by
        // setMembers at every value position before this is reached; a
        // term-valued return can only carry the single-member case
        val items = n.get("@set")
        val seq = if (items.isArray) items.elements().asScala.toSeq else Seq(items)
        require(seq.size <= 1,
          "multi-member @set must be flattened by the caller (setMembers)")
        seq.headOption.flatMap(valueTerm(_, td.copy(container = ""), ctx, graph))
      case n if n.isObject && n.has("@value") =>
        val value = n.get("@value")
        if (value.isNull) return None
        val tN = Option(n.get("@type")).filterNot(_.isNull).map(_.asText)
        val lN = Option(n.get("@language")).filterNot(_.isNull).map(_.asText)
        val dN = Option(n.get("@direction")).filterNot(_.isNull).map(_.asText)
        if (tN.contains("@json"))
          Some(Term.lit(value.toString, RDF + "JSON"))
        else if (lN.isDefined || dN.isDefined) {
          val lang = lN.getOrElse("") + dN.map("--" + _).getOrElse("")
          Some(Term.langLit(value.asText, lang))
        } else tN match {
          case Some(t) =>
            val dt = expandIri(t, ctx, vocabMode = true).getOrElse(t)
            val lex =
              if (value.isNumber && value.isIntegralNumber) value.bigIntegerValue.toString
              else if (value.isNumber) canonicalDouble(value.asDouble)
              else if (value.isBoolean) { if (value.asBoolean) "true" else "false" }
              else value.asText
            Some(Term.lit(lex, dt))
          case None =>
            valueTerm(value, TermDef(td.iri), ctx, graph) // native typing
        }
      case n if n.isObject => Some(node(n, ctx, graph)) // nested node object
      case n if n.isArray =>
        throw new IllegalArgumentException(s"unexpected nested array value: $n")
      case other =>
        throw new IllegalArgumentException(s"unsupported JSON-LD value: $other")
    }

    private def listTerm(items: Seq[JsonNode], td: TermDef, ctx: Ctx,
        graph: Term): Term = {
      // @set wrappers inside list items flatten into the list (expansion)
      val terms = items.flatMap(setMembers).flatMap(valueTerm(_, td, ctx, graph))
      if (terms.isEmpty) Term.iri(RDF + "nil")
      else {
        val cells = terms.map(_ => freshBnode())
        cells.lazyZip(terms).zipWithIndex.foreach { case ((cell, t), i) =>
          emit(cell, Term.iri(RDF + "first"), t, graph)
          emit(cell, Term.iri(RDF + "rest"),
            if (i == cells.size - 1) Term.iri(RDF + "nil") else cells(i + 1), graph)
        }
        cells.head
      }
    }
  }

  /** Canonical xsd:double lexical form per JSON-LD toRDF (XSD canonical:
   * mantissa E exponent — 4.5 → "4.5E0"). */
  private def canonicalDouble(d: Double): String = {
    // valueOf goes through Double.toString's SHORTEST decimal form;
    // `new BigDecimal(d)` would expand the binary fraction and emit
    // non-canonical forms like 1.1000000000000001E0 for 1.1
    val bd = java.math.BigDecimal.valueOf(d)
    val s = new java.text.DecimalFormat("0.0##############E0",
      java.text.DecimalFormatSymbols.getInstance(java.util.Locale.ROOT))
    s.format(bd)
  }

  // ---------------------------------------------------------------- write

  /** Serialize quads as flat expanded-form JSON-LD: a top-level array of
   * node objects (default graph first, then one graph object per named
   * graph), each property in expanded form — the shape titanium emits
   * before compaction, chosen because it round-trips through `parse`
   * without a context. */
  def write(quads: Seq[Quad]): String = {
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    def termRef(t: Term): JsonNode = {
      val o = mapper.createObjectNode()
      t.kind match {
        case Term.KIND_IRI => o.put("@id", t.lex)
        case Term.KIND_BNODE => o.put("@id", "_:" + t.lex)
        case _ =>
          o.put("@value", t.lex)
          if (t.lang.nonEmpty) {
            val (l, d) = t.lang.split("--") match {
              case Array(l0, d0) => (l0, d0)
              case _ => (t.lang, "")
            }
            if (l.nonEmpty) o.put("@language", l)
            if (d.nonEmpty) o.put("@direction", d)
          } else if (t.dt.nonEmpty && t.dt != Term.XSD_STRING)
            o.put("@type", t.dt)
      }
      o
    }
    def nodesInto(target: com.fasterxml.jackson.databind.node.ArrayNode,
        triples: Seq[Quad]): Unit = {
      triples.groupBy(q => q.s).toSeq.sortBy(_._1.toNTriples).foreach {
        case (s, qs) =>
          val n = mapper.createObjectNode()
          n.put("@id", if (s.isBNode) "_:" + s.lex else s.lex)
          qs.groupBy(_.p.lex).toSeq.sortBy(_._1).foreach { case (p, pqs) =>
            val vals = mapper.createArrayNode()
            pqs.map(_.o).foreach(o => vals.add(termRef(o)))
            n.set[JsonNode](p, vals)
          }
          target.add(n)
      }
    }
    val (dflt, named) = quads.partition(_.g.lex == Term.DEFAULT_GRAPH)
    nodesInto(arr, dflt)
    named.groupBy(_.g).toSeq.sortBy(_._1.toNTriples).foreach { case (g, qs) =>
      val gObj = mapper.createObjectNode()
      gObj.put("@id", if (g.isBNode) "_:" + g.lex else g.lex)
      val inner = mapper.createArrayNode()
      nodesInto(inner, qs)
      gObj.set[JsonNode]("@graph", inner)
      arr.add(gObj)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(arr)
  }
}
