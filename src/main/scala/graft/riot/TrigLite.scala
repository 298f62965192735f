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
    private val prolog = new StringBuilder
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
        else if (s.regionMatches(true, i, "GRAPH", 0, 5) &&
          (i + 5 >= s.length || !s.charAt(i + 5).isLetterOrDigit)) {
          i += 5
          graphBlock(graphName())
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
      if (defaultBuf.nonEmpty)
        TurtleLite.parse(prolog.toString + defaultBuf.toString, base)
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
      prefixes(pfx) = iriRefRaw()
      skip()
      if (i < s.length && s.charAt(i) == '.') i += 1
      else if (isAt) fail("@prefix needs '.'")
      prolog.append(s.substring(start, i)).append('\n')
    }

    private def baseDecl(): Unit = {
      val start = i
      val isAt = s.charAt(i) == '@'
      i += (if (isAt) 5 else 4); skip()
      base = iriRefRaw()
      skip()
      if (i < s.length && s.charAt(i) == '.') i += 1
      else if (isAt) fail("@base needs '.'")
      prolog.append(s.substring(start, i)).append('\n')
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

    /** IRI ref or prefixed name; None when neither shape is next. */
    private def tryGraphName(): Option[Term] = {
      skip()
      if (i >= s.length) return None
      if (s.charAt(i) == '<')
        Some(Term.iri(graft.normalize.Iri.resolve(base, iriRefRaw())))
      else {
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

    /** `{ turtle }` → TurtleLite triples in graph g. */
    private def graphBlock(g: Term): Unit = {
      skip()
      if (i >= s.length || s.charAt(i) != '{') fail("expected '{'")
      i += 1
      val bodyStart = i
      var depth = 1
      while (i < s.length && depth > 0) {
        s.charAt(i) match {
          case '"' => skipString()
          case '#' => while (i < s.length && s.charAt(i) != '\n') i += 1
          case '{' => depth += 1; i += 1
          case '}' => depth -= 1; i += 1
          case _ => i += 1
        }
      }
      if (depth > 0) fail("unterminated graph block")
      // TriG: the last statement's '.' is optional before '}' — TurtleLite
      // (fed the extracted body) requires it, so supply one
      val body0 = s.substring(bodyStart, i - 1)
      val body =
        if (body0.trim.nonEmpty && !body0.trim.endsWith(".")) body0 + "\n."
        else body0
      blockN += 1
      TurtleLite.parse(prolog.toString + body, base, freshScope = s"g${blockN}_")
        .foreach(t => out += Quad(t.s, t.p, t.o, g))
      skip()
      if (i < s.length && s.charAt(i) == '.') i += 1 // optional trailing '.'
    }

    private def skipString(): Unit = {
      i += 1
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') i += 2 else i += 1
      }
      if (i < s.length) i += 1
    }

    /** Copy one default-graph statement (up to its terminating unquoted '.'
     * followed by whitespace/EOF) into the default buffer. */
    private def defaultStatement(): Unit = {
      val start = i
      var done = false
      while (!done && i < s.length) {
        s.charAt(i) match {
          case '"' => skipString()
          case '#' => while (i < s.length && s.charAt(i) != '\n') i += 1
          case '.' if i + 1 >= s.length || Character.isWhitespace(s.charAt(i + 1)) =>
            i += 1; done = true
          case '{' => fail("graph block after non-graph-name term")
          case _ => i += 1
        }
      }
      if (!done) fail("unterminated statement (missing '.')")
      defaultBuf.append(s.substring(start, i)).append('\n')
    }
  }
}
