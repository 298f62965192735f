package graft.riot

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.{NTriplesEscape, Term, Triple}

/**
 * N-Triples source/sink — the Spark mapping of the reference's line-oriented
 * RIOT lang (jena-arq/src/main/java/org/apache/jena/riot/lang/LangNTriples.java,
 * tokens per riot/tokens/TokenizerText.java). Because the format is strictly
 * one-triple-per-line, a file splits on line boundaries: `spark.read.text`
 * gives HDFS-block-aligned splits and the parse runs as a narrow
 * `mapPartitions` — the distributed twin of the reference's AsyncParser
 * producer/consumer (riot/system/AsyncParser.java:52–346), with executor
 * parallelism in place of the background thread (SURVEY.md §2.1).
 *
 * The writer emits canonical N-Triples (NodeFormatterNT-style escaping,
 * riot/out/NodeFormatterNT.java) — the fixture/diff interchange format.
 */
object NTriples {

  /** Parse one N-Triples line; None for blank lines/comments.
   * Malformed lines raise IllegalArgumentException (checker-style strict
   * mode, riot/system/Checker.java:60) unless `strict = false`. */
  def parseLine(line: String, strict: Boolean = true,
      cache: NodeCache = null): Option[Triple] = {
    val s = line.trim
    if (s.isEmpty || s.startsWith("#")) return None
    try {
      val p = new LineParser(s, cache)
      val subj = p.term()
      if (subj.kind != Term.KIND_IRI && subj.kind != Term.KIND_BNODE)
        throw new IllegalArgumentException("subject must be an IRI or blank node")
      val pred = p.term()
      if (pred.kind != Term.KIND_IRI)
        throw new IllegalArgumentException("predicate must be an IRI")
      val obj = p.term()
      p.dot()
      Some(Triple(subj, pred, obj))
    } catch {
      case e: IllegalArgumentException =>
        if (strict) throw new IllegalArgumentException(s"bad N-Triples line: $s", e)
        else None
    }
  }

  /** Distributed read: text lines → Dataset[Triple]. Splittable; blank
   * lines and comments are skipped, malformed lines fail the task (strict)
   * or are dropped. */
  def read(spark: SparkSession, path: String, strict: Boolean = true): Dataset[Triple] = {
    import spark.implicits._
    spark.read.textFile(path)
      .mapPartitions { lines =>
        val cache = new NodeCache() // per-partition (§2.1 node cache)
        lines.flatMap(parseLine(_, strict, cache))
      }
  }

  /** Parse an in-memory document (one `content` cell of the corpus table). */
  def parseDocument(content: String, strict: Boolean = true): Seq[Triple] =
    content.linesIterator.flatMap(parseLine(_, strict)).toSeq

  /** Parse a single term in N-Triples syntax (TSV result cells, fixture
   * helpers). Raises on malformed input. */
  def parseTerm(text: String): Term = new LineParser(text.trim).term()

  /** Parse the canonical `<<( s p o )>>` text of a triple term back into
   * its three components (RDF-star SUBJECT/PREDICATE/OBJECT accessors);
   * None when the text is not a well-formed triple term. */
  def parseTripleTermComponents(lexForm: String): Option[(Term, Term, Term)] = {
    val s = lexForm.trim
    if (!s.startsWith("<<(") || !s.endsWith(")>>")) return None
    try {
      val p = new LineParser(s.substring(3, s.length - 3).trim)
      Some((p.term(), p.term(), p.term()))
    } catch { case _: IllegalArgumentException => None }
  }

  /** Canonical N-Triples lines from a Dataset[Triple]. */
  def format(triples: Dataset[Triple]): Dataset[String] = {
    import triples.sparkSession.implicits._
    triples.map(_.toNTriples)
  }

  /** Canonical N-Triples lines from the (s,p,o) struct-column DataFrame. */
  def formatDF(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.selectExpr("s", "p", "o").as[Triple].map(_.toNTriples)
  }

  def write(triples: Dataset[Triple], path: String): Unit =
    format(triples).write.mode("overwrite").text(path)

  /** Parse-time node cache — the reference's FactoryRDFCaching analog
   * (riot/system/FactoryRDFCaching.java:35–47: a 5,000-entry string→Node
   * cache, because predicates and hot IRIs repeat millions of times in a
   * real feed). One instance PER PARTITION (created inside mapPartitions,
   * never shared across tasks); keyed on the raw IRI token so a hit skips
   * unescaping + validation entirely. LRU via access-ordered
   * LinkedHashMap; only successful parses are cached, so error semantics
   * are untouched. */
  final class NodeCache(capacity: Int = 5000) {
    private var hitCount = 0L
    private val m = new java.util.LinkedHashMap[String, Term](
      capacity * 4 / 3 + 1, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Term]): Boolean = size() > capacity
    }
    def get(key: String)(mk: => Term): Term = {
      val v = m.get(key)
      if (v != null) { hitCount += 1; v }
      else { val t = mk; m.put(key, t); t }
    }
    def hits: Long = hitCount
  }

  // ---- single-line recursive-descent parser (TokenizerText for one line);
  //      shared with NQuads (LangNQuads is LangNTriples + a graph slot)
  private[riot] final class LineParser(s: String, cache: NodeCache = null) {
    private var i = 0

    private def ws(): Unit = while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"$msg at $i")

    /** Is the next non-space char the statement terminator? (N-Quads uses
     * this to decide whether a 4th (graph) term is present.) */
    def peekDot: Boolean = { ws(); i < s.length && s.charAt(i) == '.' }

    def term(): Term = {
      ws()
      if (i >= s.length) fail("unexpected end")
      s.charAt(i) match {
        case '<' if s.startsWith("<<(", i) => tripleTerm()
        case '<' => iriRef()
        case '_' => bnode()
        case '"' => literal()
        case c   => fail(s"unexpected char '$c'")
      }
    }

    private def iriRef(): Term = {
      val end = s.indexOf('>', i)
      if (end < 0) fail("unterminated IRI")
      val iri = s.substring(i + 1, end)
      i = end + 1
      // strict IRIREF: \u/\U escapes only, no control/space/<>"{}|^`\ chars,
      // and N-Triples IRIs must be absolute (nt-syntax-bad-uri-*)
      def parse = Term.iri(Chars.requireAbsolute(Chars.unescapeIri(iri)))
      if (cache != null) cache.get(iri)(parse) else parse
    }

    private def bnode(): Term = {
      if (i + 1 >= s.length || s.charAt(i + 1) != ':') fail("bad bnode")
      i += 2
      val start = i
      while (i < s.length && (Chars.pnChars(s.codePointAt(i)) || s.charAt(i) == '.'))
        i += Character.charCount(s.codePointAt(i))
      var label = s.substring(start, i)
      // a trailing '.' is the statement terminator, not part of the label
      while (label.endsWith(".")) { label = label.dropRight(1); i -= 1 }
      if (!Chars.validBnodeLabel(label)) fail(s"invalid blank node label '_:$label'")
      Term.bnode(label)
    }

    private def literal(): Term = {
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= s.length) fail("bad escape")
          sb.append(s.charAt(i)); sb.append(s.charAt(i + 1)); i += 2
        } else { sb.append(c); i += 1 }
      }
      if (i >= s.length) fail("unterminated literal")
      i += 1 // closing quote
      val lex = Chars.unescapeString(sb.toString)
      ws() // tokens may be whitespace-separated: `"x" @en`, `"2" ^^ <dt>`
      if (i < s.length && s.charAt(i) == '@') {
        i += 1
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
        val tag = s.substring(start, i)
        if (!Chars.validLangTag(tag)) fail(s"invalid language tag '@$tag'")
        Term.langLit(lex, tag)
      } else if (i + 1 < s.length && s.charAt(i) == '^' && s.charAt(i + 1) == '^') {
        i += 2
        ws()
        val dt = iriRef()
        if (dt.lex == Chars.RDF_LANG_STRING || dt.lex == Chars.RDF_DIR_LANG_STRING)
          fail("rdf:langString/dirLangString literals need a language tag, not ^^")
        Term.lit(lex, dt.lex)
      } else Term.string(lex)
    }

    /** RDF 1.2 triple term `<<( s p o )>>` — kept as canonical text in
     * `lex` (bounded recursion, SURVEY.md §1.7). */
    private def tripleTerm(): Term = {
      i += 3
      val ts = term(); val tp = term(); val to = term()
      if (ts.kind != Term.KIND_IRI && ts.kind != Term.KIND_BNODE)
        fail("triple-term subject must be an IRI or blank node")
      if (tp.kind != Term.KIND_IRI) fail("triple-term predicate must be an IRI")
      ws()
      if (!s.startsWith(")>>", i)) fail("unterminated triple term")
      i += 3
      Term(Term.KIND_TRIPLE_TERM,
        "<<( " + ts.toNTriples + " " + tp.toNTriples + " " + to.toNTriples + " )>>", "", "")
    }

    def dot(): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != '.') fail("missing final dot")
      i += 1
      ws()
      if (i < s.length && s.charAt(i) != '#') fail("trailing content")
    }
  }
}
