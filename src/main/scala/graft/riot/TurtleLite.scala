package graft.riot

import scala.collection.mutable.ListBuffer

import graft.model.{NTriplesEscape, Term, Triple}

/**
 * Turtle-subset document parser — whole-document per row, matching how the
 * corpus table carries one `content` per file (SURVEY.md §2.1 "file parse"
 * row: Turtle-family languages are stateful per document, so the natural
 * Spark unit is the document, not the line). Grammar coverage mirrors the
 * parts of the reference's LangTurtleBase
 * (jena-arq/src/main/java/org/apache/jena/riot/lang/LangTurtleBase.java,
 * 838 LoC) that RDF fixtures and the W3C test manifests actually use:
 *
 *   @prefix / PREFIX, @base / BASE, prefixed names, <iri> refs resolved
 *   against the base (graft.normalize.Iri), `a` → rdf:type,
 *   predicate lists `;`, object lists `,`, bnode labels `_:x`,
 *   anonymous bnodes and bnode property lists `[ p o ; … ]`,
 *   RDF collections `( e1 e2 … )` → rdf:first/rdf:rest chains,
 *   string literals with escapes / @lang / ^^dt — short and long
 *   (`"""…"""`, `'''…'''`) and single-quoted forms —, numeric shorthand
 *   (integer/decimal/double per the Turtle grammar), booleans,
 *   RDF 1.2 triple terms `<<( s p o )>>`, reified triples
 *   `<< s p o ~ reifier >>` (sugar for `reifier rdf:reifies <<( s p o )>>`;
 *   a fresh bnode reifier when `~` is absent; the inner triple is NOT
 *   asserted — reference: LangTurtleBase reifiedTriple/tripleTerm paths),
 *   and annotation syntax `o ~ r {| p2 o2 |}` (asserts the base triple AND
 *   reifies it, annotation properties hang off the reifier).
 *
 * Still out of scope (documented, raises — never silently wrong):
 * `@forSome`-era N3 constructs.
 */
object TurtleLite {

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val RDF_TYPE = RDF + "type"
  private val RDF_FIRST = RDF + "first"
  private val RDF_REST = RDF + "rest"
  private val RDF_NIL = RDF + "nil"
  private val RDF_REIFIES = RDF + "reifies"

  /** `freshScope` namespaces GENERATED bnode labels (anon `[]`, collection
   * cells, reifiers) — TriG passes a per-graph-block scope so generated
   * labels never collide across blocks, while EXPLICIT `_:label`s keep
   * document scope. */
  def parse(content: String, baseIri: String = "", freshScope: String = ""): Seq[Triple] =
    new Parser(content, baseIri, freshScope).run()

  private final class Parser(s: String, var base: String, freshScope: String) {
    private var i = 0
    private val prefixes = scala.collection.mutable.Map[String, String]()
    private val out = ListBuffer[Triple]()
    private var anonN = 0

    /** Fresh document-scoped bnode for `[ … ]` / collection cells — the
     * "__a" prefix keeps generated labels apart from data labels (the
     * reference allocates via LabelToNode scopes, LabelToNode.java:48). */
    private def freshBnode(): Term = { anonN += 1; Term.bnode("__a" + freshScope + anonN) }

    def run(): Seq[Triple] = {
      skip()
      while (i < s.length) {
        statement()
        skip()
      }
      out.toList
    }

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Turtle parse error at offset $i: $msg")

    private def skip(): Unit = {
      var going = true
      while (going) {
        while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < s.length && s.charAt(i) == '#') {
          while (i < s.length && s.charAt(i) != '\n') i += 1
        } else going = false
      }
    }

    private def word(): String = {
      val start = i
      while (i < s.length && !Character.isWhitespace(s.charAt(i))) i += 1
      s.substring(start, i)
    }

    private def statement(): Unit = {
      if (s.startsWith("@prefix", i) || s.regionMatches(true, i, "PREFIX", 0, 6)) {
        val isAt = s.charAt(i) == '@'
        i += (if (isAt) 7 else 6); skip()
        val pfx = { val w = word(); if (!w.endsWith(":")) fail(s"bad prefix decl '$w'"); w.dropRight(1) }
        skip()
        val iri = iriRef()
        prefixes(pfx) = iri.lex
        skip()
        if (isAt) { if (i < s.length && s.charAt(i) == '.') i += 1 else fail("@prefix needs '.'") }
        else if (i < s.length && s.charAt(i) == '.') i += 1 // tolerated
      } else if (s.startsWith("@base", i) || s.regionMatches(true, i, "BASE", 0, 4)) {
        val isAt = s.charAt(i) == '@'
        i += (if (isAt) 5 else 4); skip()
        base = iriRef().lex
        skip()
        if (isAt) { if (i < s.length && s.charAt(i) == '.') i += 1 else fail("@base needs '.'") }
        else if (i < s.length && s.charAt(i) == '.') i += 1
      } else triplesBlock()
    }

    private def triplesBlock(): Unit = {
      val subj = term(isPredicate = false)
      skip()
      // `[ p o ] .` / `( … ) .` — a subject-only statement is legal when
      // the subject form itself emitted triples
      if (i < s.length && s.charAt(i) == '.') { i += 1; return }
      predicateObjectList(subj, inBracket = false)
      skip()
      if (i < s.length && s.charAt(i) == '.') i += 1
      else fail("expected '.' after triples")
    }

    /** `p o (, o)* (; p o …)*` — shared by top-level triples and bnode
     * property lists (terminated by '.' outside brackets, ']' inside). */
    private def predicateObjectList(subj: Term, inBracket: Boolean): Unit = {
      var more = true
      while (more) {
        skip()
        val pred = term(isPredicate = true)
        var moreObj = true
        while (moreObj) {
          skip()
          val obj = term(isPredicate = false)
          out += Triple(subj, pred, obj)
          skip()
          annotation(subj, pred, obj)
          if (i < s.length && s.charAt(i) == ',') i += 1 else moreObj = false
        }
        skip()
        if (i < s.length && s.charAt(i) == ';') {
          i += 1; skip()
          // trailing ';' before the terminator is legal Turtle
          if (i < s.length && (s.charAt(i) == '.' || s.charAt(i) == ']' ||
            s.charAt(i) == '|')) more = false
        } else more = false
      }
    }

    private def term(isPredicate: Boolean): Term = {
      skip()
      if (i >= s.length) fail("unexpected end of document")
      s.charAt(i) match {
        case '<' if s.startsWith("<<(", i) =>
          if (isPredicate) fail("triple-term predicate") else tripleTerm()
        case '<' if s.startsWith("<<", i) =>
          if (isPredicate) fail("reified-triple predicate") else reifiedTriple()
        case '<' => Term.iri(graft.normalize.Iri.resolve(base, iriRef().lex))
        case '"' | '\'' => if (isPredicate) fail("literal predicate") else literal()
        case '_' => bnodeLabel()
        case '(' =>
          if (isPredicate) fail("collection predicate") else collection()
        case '[' =>
          if (isPredicate) fail("bnode predicate") else bnodePropertyList()
        case _ =>
          val w = tokenWord()
          if (isPredicate && w == "a") Term.iri(RDF_TYPE)
          else if (!isPredicate && (w == "true" || w == "false")) Term.lit(w, Term.XSD_BOOLEAN)
          else if (!isPredicate && w.nonEmpty &&
            (w.charAt(0).isDigit || w.charAt(0) == '-' || w.charAt(0) == '+' ||
              (w.charAt(0) == '.' && w.length > 1 && w.charAt(1).isDigit)))
            numericLiteral(w)
          else prefixedName(w)
      }
    }

    /** Annotation tail after an asserted triple: `( '~' reifier? )?`
     * `( '{|' predicateObjectList '|}' )*` — each annotation block hangs
     * its properties off a reifier of the just-asserted triple (Turtle 1.2
     * `annotation` production; the base triple stays asserted). */
    private def annotation(subj: Term, pred: Term, obj: Term): Unit = {
      var reifier: Option[Term] = None
      def theReifier(): Term = reifier.getOrElse {
        val r = freshBnode()
        out += Triple(r, Term.iri(RDF_REIFIES), Term(Term.KIND_TRIPLE_TERM,
          "<<( " + subj.toNTriples + " " + pred.toNTriples + " " + obj.toNTriples + " )>>",
          "", ""))
        reifier = Some(r)
        r
      }
      var going = true
      while (going) {
        skip()
        if (i < s.length && s.charAt(i) == '~') {
          i += 1; skip()
          val r =
            if (i < s.length && (s.charAt(i) == '{' || s.charAt(i) == '~')) freshBnode()
            else term(isPredicate = false)
          out += Triple(r, Term.iri(RDF_REIFIES), Term(Term.KIND_TRIPLE_TERM,
            "<<( " + subj.toNTriples + " " + pred.toNTriples + " " + obj.toNTriples + " )>>",
            "", ""))
          reifier = Some(r)
        } else if (s.startsWith("{|", i)) {
          i += 2
          val r = theReifier()
          skip()
          if (!s.startsWith("|}", i)) predicateObjectList(r, inBracket = true)
          skip()
          if (!s.startsWith("|}", i)) fail("expected '|}' closing annotation")
          i += 2
          reifier = None // a following block reifies afresh (each {|…|} its own reifier)
        } else going = false
      }
    }

    /** RDF 1.2 triple term `<<( s p o )>>` — canonical-text encoding, same
     * form as NTriples.tripleTerm (Term.KIND_TRIPLE_TERM docs). Components
     * are any term, including nested triple terms / reified triples. */
    private def tripleTerm(): Term = {
      i += 3 // '<<('
      val ts = term(isPredicate = false); skip()
      val tp = term(isPredicate = true); skip()
      val to = term(isPredicate = false); skip()
      if (!s.startsWith(")>>", i)) fail("expected ')>>' closing triple term")
      i += 3
      Term(Term.KIND_TRIPLE_TERM,
        "<<( " + ts.toNTriples + " " + tp.toNTriples + " " + to.toNTriples + " )>>", "", "")
    }

    /** RDF 1.2 reified triple `<< s p o ( ~ reifier )? >>`: emits
     * `reifier rdf:reifies <<( s p o )>>` (inner triple NOT asserted) and
     * the term value is the reifier node — a fresh bnode unless `~` names
     * one (Turtle 1.2 `reifiedTriple` production). */
    private def reifiedTriple(): Term = {
      i += 2 // '<<'
      val ts = term(isPredicate = false); skip()
      val tp = term(isPredicate = true); skip()
      val to = term(isPredicate = false); skip()
      val tt = Term(Term.KIND_TRIPLE_TERM,
        "<<( " + ts.toNTriples + " " + tp.toNTriples + " " + to.toNTriples + " )>>", "", "")
      val reifier =
        if (i < s.length && s.charAt(i) == '~') {
          i += 1; skip()
          // a reifier may be an IRI or a blank node; '>' right after '~'
          // means an anonymous reifier was written as `~ >>`? — the
          // grammar allows bare `~` (fresh bnode) too
          if (s.startsWith(">>", i)) freshBnode() else term(isPredicate = false)
        } else freshBnode()
      skip()
      if (!s.startsWith(">>", i)) fail("expected '>>' closing reified triple")
      i += 2
      out += Triple(reifier, Term.iri(RDF_REIFIES), tt)
      reifier
    }

    /** `( e1 e2 … )` → rdf:first/rdf:rest/rdf:nil chain over fresh bnodes
     * (LangTurtleBase's triplesList); `()` is rdf:nil itself. */
    private def collection(): Term = {
      i += 1 // '('
      skip()
      val cells = ListBuffer[Term]()
      while (i < s.length && s.charAt(i) != ')') {
        cells += term(isPredicate = false)
        skip()
      }
      if (i >= s.length) fail("unterminated collection")
      i += 1 // ')'
      if (cells.isEmpty) Term.iri(RDF_NIL)
      else {
        val nodes = cells.map(_ => freshBnode())
        nodes.zip(cells).zipWithIndex.foreach { case ((n, cell), k) =>
          out += Triple(n, Term.iri(RDF_FIRST), cell)
          out += Triple(n, Term.iri(RDF_REST),
            if (k == cells.size - 1) Term.iri(RDF_NIL) else nodes(k + 1))
        }
        nodes.head
      }
    }

    /** `[]` / `[ p o ; … ]` → fresh bnode (+ its property triples). */
    private def bnodePropertyList(): Term = {
      i += 1 // '['
      skip()
      val node = freshBnode()
      if (i < s.length && s.charAt(i) == ']') { i += 1; return node }
      predicateObjectList(node, inBracket = true)
      skip()
      if (i >= s.length || s.charAt(i) != ']') fail("unterminated '['")
      i += 1
      node
    }

    /** Token up to whitespace or a structural delimiter ('>' '{' '|' '}'
     * '~' end tokens for the RDF 1.2 `>>` / `{| |}` / `~` constructs). */
    private def tokenWord(): String = {
      val start = i
      while (i < s.length && !Character.isWhitespace(s.charAt(i)) &&
        ";,()[]>{|}~".indexOf(s.charAt(i)) < 0 &&
        // '.' ends a token only when followed by whitespace/EOF/bracket (it
        // may be part of a decimal or a prefixed local name)
        !(s.charAt(i) == '.' && (i + 1 >= s.length ||
          Character.isWhitespace(s.charAt(i + 1)) ||
          ")]".indexOf(s.charAt(i + 1)) >= 0)))
        i += 1
      s.substring(start, i)
    }

    /** Turtle numeric shorthand typing: INTEGER / DECIMAL / DOUBLE
     * (the reference types these in LangTurtleBase via token kind). */
    private def numericLiteral(w: String): Term =
      if (w.exists(c => c == 'e' || c == 'E')) Term.lit(w, Term.XSD_DOUBLE)
      else if (w.contains('.')) Term.lit(w, Term.XSD_DECIMAL)
      else Term.lit(w, Term.XSD_INTEGER)

    private def prefixedName(w: String): Term = {
      val idx = w.indexOf(':')
      if (idx < 0) fail(s"expected term, got '$w'")
      val (pfx, local) = (w.substring(0, idx), w.substring(idx + 1))
      prefixes.get(pfx) match {
        case Some(ns) => Term.iri(ns + local)
        case None => fail(s"undeclared prefix '$pfx:'")
      }
    }

    private def iriRef(): Term = {
      if (s.charAt(i) != '<') fail("expected '<'")
      val end = s.indexOf('>', i)
      if (end < 0) fail("unterminated IRI")
      val iri = s.substring(i + 1, end)
      i = end + 1
      Term.iri(NTriplesEscape.unescape(iri))
    }

    private def bnodeLabel(): Term = {
      if (i + 1 >= s.length || s.charAt(i + 1) != ':') fail("bad bnode label")
      i += 2
      val start = i
      while (i < s.length && !Character.isWhitespace(s.charAt(i)) &&
        ";,()[]>{|}~".indexOf(s.charAt(i)) < 0 &&
        !(s.charAt(i) == '.' && (i + 1 >= s.length ||
          Character.isWhitespace(s.charAt(i + 1)) ||
          ")]".indexOf(s.charAt(i + 1)) >= 0)))
        i += 1
      Term.bnode(s.substring(start, i))
    }

    private def literal(): Term = {
      val q = s.charAt(i)
      val longQ = s.startsWith(q.toString * 3, i)
      val lex =
        if (longQ) {
          i += 3
          val end = s.indexOf(q.toString * 3, i)
          if (end < 0) fail("unterminated long string")
          val raw = s.substring(i, end)
          i = end + 3
          NTriplesEscape.unescape(raw)
        } else {
          i += 1
          val sb = new StringBuilder
          while (i < s.length && s.charAt(i) != q) {
            val c = s.charAt(i)
            if (c == '\\') {
              if (i + 1 >= s.length) fail("bad escape")
              sb.append(c).append(s.charAt(i + 1)); i += 2
            } else { sb.append(c); i += 1 }
          }
          if (i >= s.length) fail("unterminated string")
          i += 1
          NTriplesEscape.unescape(sb.toString)
        }
      if (i < s.length && s.charAt(i) == '@') {
        i += 1
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
        val tag = s.substring(start, i)
        // RDF 1.2 LANGTAG: optional '--dir' suffix, dir ∈ {ltr, rtl}
        val di = tag.indexOf("--")
        if (di >= 0 && tag.substring(di + 2) != "ltr" && tag.substring(di + 2) != "rtl")
          fail(s"invalid base direction '${tag.substring(di + 2)}' (must be ltr or rtl)")
        Term.langLit(lex, tag)
      } else if (i + 1 < s.length && s.charAt(i) == '^' && s.charAt(i + 1) == '^') {
        i += 2
        skip()
        val dt = term(isPredicate = false)
        Term.lit(lex, dt.lex)
      } else Term.string(lex)
    }
  }
}
