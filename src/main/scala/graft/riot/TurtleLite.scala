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
 * 838 LoC) that RDF fixtures actually use:
 *
 *   @prefix / PREFIX, @base / BASE, prefixed names, <iri> refs resolved
 *   against the base (graft.normalize.Iri), `a` → rdf:type,
 *   predicate lists `;`, object lists `,`, bnode labels `_:x`,
 *   string literals with escapes / @lang / ^^dt, numeric shorthand
 *   (integer/decimal/double per the Turtle grammar), booleans.
 *
 * Out of scope (documented, not silently wrong): collections `( )`,
 * anonymous bnodes `[ ]`, multiline `\"\"\"` strings — the parser raises on
 * them. Parsing is pure per document ⇒ runs inside `mapPartitions` with no
 * shared state; prefix/base maps are document-local exactly like the
 * reference's per-parser `PrefixMap`.
 */
object TurtleLite {

  private val RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  def parse(content: String, baseIri: String = ""): Seq[Triple] =
    new Parser(content, baseIri).run()

  private final class Parser(s: String, var base: String) {
    private var i = 0
    private val prefixes = scala.collection.mutable.Map[String, String]()
    private val out = ListBuffer[Triple]()

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
          if (i < s.length && s.charAt(i) == ',') i += 1 else moreObj = false
        }
        skip()
        if (i < s.length && s.charAt(i) == ';') {
          i += 1; skip()
          // trailing ';' before '.' is legal Turtle
          if (i < s.length && s.charAt(i) == '.') { i += 1; more = false }
        } else if (i < s.length && s.charAt(i) == '.') { i += 1; more = false }
        else fail("expected ';', ',' or '.'")
      }
    }

    private def term(isPredicate: Boolean): Term = {
      skip()
      if (i >= s.length) fail("unexpected end of document")
      s.charAt(i) match {
        case '<' => Term.iri(graft.normalize.Iri.resolve(base, iriRef().lex))
        case '"' => if (isPredicate) fail("literal predicate") else literal()
        case '_' => bnodeLabel()
        case '(' => fail("collections '()' not supported by TurtleLite")
        case '[' => fail("anonymous bnodes '[]' not supported by TurtleLite")
        case _ =>
          val w = tokenWord()
          if (isPredicate && w == "a") Term.iri(RDF_TYPE)
          else if (!isPredicate && (w == "true" || w == "false")) Term.lit(w, Term.XSD_BOOLEAN)
          else if (!isPredicate && w.nonEmpty &&
            (w.charAt(0).isDigit || w.charAt(0) == '-' || w.charAt(0) == '+' || w.charAt(0) == '.'))
            numericLiteral(w)
          else prefixedName(w)
      }
    }

    /** Token up to whitespace or a structural delimiter. */
    private def tokenWord(): String = {
      val start = i
      while (i < s.length && !Character.isWhitespace(s.charAt(i)) &&
        ";,".indexOf(s.charAt(i)) < 0 &&
        // '.' ends a token only when followed by whitespace/EOF (it may be
        // part of a decimal or a prefixed local name)
        !(s.charAt(i) == '.' && (i + 1 >= s.length || Character.isWhitespace(s.charAt(i + 1)))))
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
        ";,".indexOf(s.charAt(i)) < 0 &&
        !(s.charAt(i) == '.' && (i + 1 >= s.length || Character.isWhitespace(s.charAt(i + 1)))))
        i += 1
      Term.bnode(s.substring(start, i))
    }

    private def literal(): Term = {
      if (s.startsWith("\"\"\"", i)) fail("multiline strings not supported by TurtleLite")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= s.length) fail("bad escape")
          sb.append(c).append(s.charAt(i + 1)); i += 2
        } else { sb.append(c); i += 1 }
      }
      if (i >= s.length) fail("unterminated string")
      i += 1
      val lex = NTriplesEscape.unescape(sb.toString)
      if (i < s.length && s.charAt(i) == '@') {
        i += 1
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
        Term.langLit(lex, s.substring(start, i))
      } else if (i + 1 < s.length && s.charAt(i) == '^' && s.charAt(i + 1) == '^') {
        i += 2
        skip()
        val dt = term(isPredicate = false)
        Term.lit(lex, dt.lex)
      } else Term.string(lex)
    }
  }
}
