package graft.riot

import scala.collection.mutable.ListBuffer

import graft.model.{Quad, Term}

/**
 * TriG-subset document parser (reference: jena-arq/.../riot/lang/
 * LangTriG.java — "Turtle plus graph blocks"). Structure handled here:
 *
 *   prologue decls (@prefix/PREFIX/@base/BASE),
 *   `GRAPH <g> { turtle }`, `GRAPH pn:g { turtle }`,
 *   the keyword-less forms `<g> { turtle }` / `pn:g { turtle }`,
 *   and bare top-level triples (default graph).
 *
 * Graph-block BODIES are delegated to TurtleLite with the document's
 * prologue prepended (prefix/base scope is document-wide in TriG, exactly
 * the reference's per-parser PrefixMap), so the triple grammar inside
 * blocks is TurtleLite's, with the same raises for unsupported syntax.
 * Like TurtleLite, parsing is pure per document → mapPartitions-safe.
 */
object TrigLite {

  def parse(content: String, baseIri: String = ""): Seq[Quad] =
    new Splitter(content, baseIri).run()

  private final class Splitter(s: String, baseIri: String) {
    private var i = 0
    private var blockN = 0
    /** Directive decls AND default-graph statements in DOCUMENT ORDER —
     * replayed as one Turtle document so each statement resolves against
     * the prefixes/base in force at its position (IRI-resolution-08 has
     * interleaved @base redefinitions). */
    private val defaultBuf = new StringBuilder
    private val prefixes = scala.collection.mutable.Map[String, String]()
    private var base = baseIri
    private val out = ListBuffer[Quad]()

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"TriG parse error at offset $i: $msg")

    private def skip(): Unit = {
      var going = true
      while (going) {
        while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < s.length && s.charAt(i) == '#') {
          while (i < s.length && s.charAt(i) != '\n') i += 1
        } else going = false
      }
    }

    def run(): Seq[Quad] = {
      skip()
      while (i < s.length) {
        if (s.startsWith("@prefix", i) || s.regionMatches(true, i, "PREFIX", 0, 6))
          prefixDecl()
        else if (s.startsWith("@base", i) || s.regionMatches(true, i, "BASE", 0, 4))
          baseDecl()
        else if (s.startsWith("@version", i) || s.regionMatches(true, i, "VERSION", 0, 7))
          versionDecl()
        else if (s.regionMatches(true, i, "GRAPH", 0, 5) &&
          (i + 5 >= s.length || !s.charAt(i + 5).isLetterOrDigit)) {
          i += 5
          graphBlock(graphName())
        } else if (s.charAt(i) == '{') {
          // bare wrappedGraph ⇒ the DEFAULT graph (TriG `block` grammar)
          graphBlock(Term.defaultGraph)
        } else {
          // keyword-less named block, or a default-graph statement
          val save = i
          val nameOpt = tryGraphName()
          skip()
          if (nameOpt.isDefined && i < s.length && s.charAt(i) == '{')
            graphBlock(nameOpt.get)
          else { i = save; defaultStatement() }
        }
        skip()
      }
      // parse from the ORIGINAL base: the buffer replays @base/@prefix
      // decls interleaved with statements in document order
      if (defaultBuf.nonEmpty)
        TurtleLite.parse(defaultBuf.toString, baseIri)
          .foreach(t => out += Quad(t.s, t.p, t.o, Term.defaultGraph))
      out.toList
    }

    private def prefixDecl(): Unit = {
      val start = i
      val isAt = s.charAt(i) == '@'
      i += (if (isAt) 7 else 6); skip()
      val colon = s.indexOf(':', i)
      if (colon < 0) fail("bad prefix decl")
      val pfx = s.substring(i, colon).trim
      i = colon + 1; skip()
      prefixes(pfx) = graft.normalize.Iri.resolve(base, iriRefRaw())
      skip()
      // only `@prefix` takes (and requires) the '.'; SPARQL-style PREFIX
      // followed by '.' is a syntax error (caught downstream)
      if (isAt) {
        if (i < s.length && s.charAt(i) == '.') i += 1 else fail("@prefix needs '.'")
      }
      defaultBuf.append(s.substring(start, i)).append('\n')
    }

    private def baseDecl(): Unit = {
      val start = i
      val isAt = s.charAt(i) == '@'
      i += (if (isAt) 5 else 4); skip()
      base = graft.normalize.Iri.resolve(base, iriRefRaw())
      skip()
      if (isAt) {
        if (i < s.length && s.charAt(i) == '.') i += 1 else fail("@base needs '.'")
      }
      defaultBuf.append(s.substring(start, i)).append('\n')
    }

    /** Turtle/TriG 1.2 version declaration — copied into the replay
     * buffer; TurtleLite validates and ignores it. */
    private def versionDecl(): Unit = {
      val start = i
      val isAt = s.charAt(i) == '@'
      i += (if (isAt) 8 else 7); skip()
      if (i >= s.length || (s.charAt(i) != '"' && s.charAt(i) != '\''))
        fail("VERSION needs a string")
      skipToken()
      skip()
      if (isAt) {
        if (i < s.length && s.charAt(i) == '.') i += 1 else fail("@version needs '.'")
      }
      defaultBuf.append(s.substring(start, i)).append('\n')
    }

    private def iriRefRaw(): String = {
      if (i >= s.length || s.charAt(i) != '<') fail("expected '<'")
      val end = s.indexOf('>', i)
      if (end < 0) fail("unterminated IRI")
      val body = s.substring(i + 1, end)
      i = end + 1
      graft.model.NTriplesEscape.unescape(body)
    }

    private def graphName(): Term = tryGraphName().getOrElse(fail("expected graph name"))

    /** labelOrSubject: IRI ref, prefixed name, `_:label`, or `[]`;
     * None when none of those shapes is next. */
    private def tryGraphName(): Option[Term] = {
      skip()
      if (i >= s.length) return None
      if (s.charAt(i) == '<')
        Some(Term.iri(graft.normalize.Iri.resolve(base, iriRefRaw())))
      else if (s.charAt(i) == '_') {
        if (i + 1 >= s.length || s.charAt(i + 1) != ':') return None
        i += 2
        val start = i
        while (i < s.length && (Chars.pnChars(s.codePointAt(i)) || s.charAt(i) == '.'))
          i += Character.charCount(s.codePointAt(i))
        var label = s.substring(start, i)
        while (label.endsWith(".")) { label = label.dropRight(1); i -= 1 }
        if (!Chars.validBnodeLabel(label)) fail(s"invalid blank node label '_:$label'")
        Some(Term.bnode(label))
      } else if (s.charAt(i) == '[') {
        // ANON graph label `[ ]`; `[ p o ]` is a subject, not a label
        val save = i
        i += 1; skip()
        if (i < s.length && s.charAt(i) == ']') {
          i += 1; blockN += 1
          Some(Term.bnode(s"__ag$blockN"))
        } else { i = save; None }
      } else {
        val save = i
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' ||
          s.charAt(i) == '-' || s.charAt(i) == '.' || s.charAt(i) == ':')) i += 1
        val w = s.substring(start, i)
        val colon = w.indexOf(':')
        if (colon < 0) { i = save; None }
        else prefixes.get(w.substring(0, colon)) match {
          case Some(ns) => Some(Term.iri(ns + w.substring(colon + 1)))
          case None => i = save; None
        }
      }
    }

    /** `{ turtle }` → TurtleLite triples in graph g, parsed with the
     * prefixes/base in force at the block, directives forbidden inside,
     * and the last statement's '.' optional before '}'. A '.' AFTER the
     * closing '}' is a syntax error (trig-graph-bad-02). */
    private def graphBlock(g: Term): Unit = {
      skip()
      if (i >= s.length || s.charAt(i) != '{') fail("expected '{'")
      i += 1
      val bodyStart = i
      var depth = 1
      while (i < s.length && depth > 0) {
        s.charAt(i) match {
          case '{' => depth += 1; i += 1
          case '}' => depth -= 1; i += 1
          case _ => skipToken()
        }
      }
      if (depth > 0) fail("unterminated graph block")
      val body = s.substring(bodyStart, i - 1)
      blockN += 1
      TurtleLite.parse(body, base, freshScope = s"g${blockN}_",
        initialPrefixes = prefixes.toMap, allowDirectives = false,
        finalDotOptional = true)
        .foreach(t => out += Quad(t.s, t.p, t.o, g))
    }

    /** Advance past one lexical token the statement/block scanners must
     * not look inside: `<iri>` (may contain '#'), short and long strings
     * in either quote char, a `\`-escape (pname local escapes), or a
     * line comment. Anything else advances one char. */
    private def skipToken(): Unit = {
      s.charAt(i) match {
        case '\\' => i = Math.min(i + 2, s.length)
        case '<' =>
          val e = s.indexOf('>', i)
          i = if (e < 0) s.length else e + 1
        case '#' => while (i < s.length && s.charAt(i) != '\n') i += 1
        case q @ ('"' | '\'') =>
          val q3 = q.toString * 3
          if (s.startsWith(q3, i)) {
            i += 3
            var done = false
            while (!done && i < s.length) {
              if (s.charAt(i) == '\\') i += 2
              else if (s.startsWith(q3, i)) { i += 3; done = true }
              else i += 1
            }
          } else {
            i += 1
            while (i < s.length && s.charAt(i) != q && s.charAt(i) != '\n') {
              if (s.charAt(i) == '\\') i += 2 else i += 1
            }
            if (i < s.length && s.charAt(i) == q) i += 1
          }
        case _ => i += 1
      }
    }

    /** Copy one default-graph statement (up to its terminating unquoted '.'
     * followed by whitespace/EOF) into the default buffer. */
    private def defaultStatement(): Unit = {
      val start = i
      var done = false
      var annDepth = 0 // inside `{| … |}` annotation blocks
      while (!done && i < s.length) {
        s.charAt(i) match {
          case '.' if annDepth == 0 &&
            (i + 1 >= s.length || Character.isWhitespace(s.charAt(i + 1))) =>
            i += 1; done = true
          case '{' if i + 1 < s.length && s.charAt(i + 1) == '|' => i += 2; annDepth += 1
          case '|' if i + 1 < s.length && s.charAt(i + 1) == '}' => i += 2; annDepth -= 1
          case '{' => fail("graph block after non-graph-name term")
          case _ => skipToken()
        }
      }
      if (!done) fail("unterminated statement (missing '.')")
      defaultBuf.append(s.substring(start, i)).append('\n')
    }
  }
}
