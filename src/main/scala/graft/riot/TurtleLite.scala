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
   * document scope. TriG graph bodies pass `initialPrefixes` (the decls in
   * force at the block), `allowDirectives = false` (`@prefix` inside a
   * graph block is a TriG syntax error) and `finalDotOptional = true`
   * (the last statement's '.' may be omitted before '}'). */
  def parse(content: String, baseIri: String = "", freshScope: String = "",
            initialPrefixes: Map[String, String] = Map.empty,
            allowDirectives: Boolean = true,
            finalDotOptional: Boolean = false): Seq[Triple] =
    new Parser(content, baseIri, freshScope, initialPrefixes,
      allowDirectives, finalDotOptional).run()

  private final class Parser(s: String, var base: String, freshScope: String,
                             initialPrefixes: Map[String, String],
                             allowDirectives: Boolean, finalDotOptional: Boolean) {
    private var i = 0
    private val prefixes = scala.collection.mutable.Map[String, String]() ++= initialPrefixes
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

    /** `@prefix` / `@base` are case-SENSITIVE (`@PREFIX` is a syntax
     * error); SPARQL-style `PREFIX`/`BASE` are case-insensitive and take
     * NO trailing '.' (turtle-syntax-bad directive cases). */
    private def statement(): Unit = {
      val atDir = s.charAt(i) == '@'
      if (s.startsWith("@prefix", i) ||
        (!atDir && s.regionMatches(true, i, "PREFIX", 0, 6) && boundaryAt(i + 6))) {
        if (!allowDirectives) fail("directives are not allowed here (inside a graph block)")
        val isAt = atDir
        i += (if (isAt) 7 else 6); skip()
        val pfx = prefixLabel()
        if (i >= s.length || s.charAt(i) != ':') fail("prefix declaration needs ':'")
        i += 1
        skip()
        val iri = iriRef()
        // a prefix IRI resolves against the in-scope base at declaration
        // (turtle-subm-27: relative prefix after @base redefinitions)
        prefixes(pfx) = graft.normalize.Iri.resolve(base, iri.lex)
        skip()
        if (isAt) { if (i < s.length && s.charAt(i) == '.') i += 1 else fail("@prefix needs '.'") }
      } else if (s.startsWith("@base", i) ||
        (!atDir && s.regionMatches(true, i, "BASE", 0, 4) && boundaryAt(i + 4))) {
        if (!allowDirectives) fail("directives are not allowed here (inside a graph block)")
        val isAt = atDir
        i += (if (isAt) 5 else 4); skip()
        base = graft.normalize.Iri.resolve(base, iriRef().lex)
        skip()
        if (isAt) { if (i < s.length && s.charAt(i) == '.') i += 1 else fail("@base needs '.'") }
      } else if (s.startsWith("@version", i) ||
        (!atDir && s.regionMatches(true, i, "VERSION", 0, 7) && boundaryAt(i + 7))) {
        // Turtle 1.2 version declaration — validated, then ignored
        if (!allowDirectives) fail("directives are not allowed here (inside a graph block)")
        val isAt = atDir
        i += (if (isAt) 8 else 7); skip()
        if (i >= s.length || (s.charAt(i) != '"' && s.charAt(i) != '\'')) fail("VERSION needs a string")
        if (s.startsWith(s.charAt(i).toString * 3, i))
          fail("VERSION takes a short-quoted string, not a long string")
        val v = literal()
        if (v.kind != Term.KIND_LIT || v.lang.nonEmpty) fail("VERSION needs a plain string")
        skip()
        if (isAt) { if (i < s.length && s.charAt(i) == '.') i += 1 else fail("@version needs '.'") }
      } else if (atDir) fail("unknown @-directive (directives are case-sensitive)")
      else triplesBlock()
    }

    /** Does a PN-name token end at position j? (keyword/boundary test).
     * A '.' is a boundary when it is the statement terminator, i.e. not
     * followed by another name character. */
    private def boundaryAt(j: Int): Boolean =
      j >= s.length || {
        val cp = s.codePointAt(j)
        if (cp == '.')
          j + 1 >= s.length || {
            val c2 = s.codePointAt(j + 1)
            !(Chars.pnChars(c2) || c2 == ':')
          }
        else !(Chars.pnChars(cp) || cp == ':')
      }

    /** PN_PREFIX label (possibly empty) before the ':' of a PNAME_NS. */
    private def prefixLabel(): String = {
      val start = i
      if (i < s.length && Chars.pnCharsBase(s.codePointAt(i))) {
        i += Character.charCount(s.codePointAt(i))
        while (i < s.length && (Chars.pnChars(s.codePointAt(i)) || s.charAt(i) == '.'))
          i += Character.charCount(s.codePointAt(i))
        while (s.charAt(i - 1) == '.') i -= 1
      }
      val p = s.substring(start, i)
      if (p.nonEmpty && !validPrefix(p)) fail(s"invalid prefix label '$p'")
      p
    }

    private def validPrefix(p: String): Boolean = {
      val cps = p.codePoints().toArray
      Chars.pnCharsBase(cps(0)) && (cps.length == 1 ||
        (Chars.pnChars(cps.last) &&
          cps.slice(1, cps.length - 1).forall(cp => Chars.pnChars(cp) || cp == '.')))
    }

    private def triplesBlock(): Unit = {
      lastWasPropsBnode = false
      val subj = term(isPredicate = false)
      if (subj.kind == Term.KIND_LIT) fail("a literal cannot be a subject")
      if (subj.kind == Term.KIND_TRIPLE_TERM)
        fail("a triple term cannot be a subject")
      val subjHadProps = lastWasPropsBnode // `[ p o ]` or `<< s p o >>`
      skip()
      // ONLY `[ p o ] .` — a NON-EMPTY bnode property list — may stand
      // alone as a statement (grammar: triples ::= subject
      // predicateObjectList | blankNodePropertyList predicateObjectList?)
      if (subjHadProps && i < s.length && s.charAt(i) == '.') { i += 1; return }
      if (subjHadProps && i >= s.length && finalDotOptional) return
      predicateObjectList(subj, inBracket = false)
      skip()
      if (i < s.length && s.charAt(i) == '.') i += 1
      else if (!(finalDotOptional && i >= s.length)) fail("expected '.' after triples")
    }

    /** Set when the LAST term parsed was a `[ p o … ]` with properties or
     * a reified triple `<< s p o >>` — the subject forms that emitted
     * their own triples and may omit the predicate-object list
     * (grammar: triples ::= subject predicateObjectList |
     * blankNodePropertyList predicateObjectList? |
     * reifiedTriple predicateObjectList?). */
    private var lastWasPropsBnode = false

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
          // any number of ';' separators, then a verb or the terminator
          // (grammar: (';' (verb objectList)?)* — `;;` and a trailing ';'
          // are both legal)
          while (i < s.length && s.charAt(i) == ';') { i += 1; skip() }
          if (i >= s.length || s.charAt(i) == '.' || s.charAt(i) == ']' ||
            s.charAt(i) == '|') more = false
        } else more = false
      }
    }

    /** `inReified` = parsing a component of `<< … >>` / `<<( … )>>`,
     * where collections and non-empty bnode property lists are not in
     * the grammar (rtSubject/rtObject/ttSubject/ttObject). */
    private def term(isPredicate: Boolean, inReified: Boolean = false): Term = {
      skip()
      if (i >= s.length) fail("unexpected end of document")
      s.charAt(i) match {
        case '<' if s.startsWith("<<(", i) =>
          if (isPredicate) fail("triple-term predicate") else tripleTerm()
        case '<' if s.startsWith("<<", i) =>
          if (isPredicate) fail("reified-triple predicate") else reifiedTriple()
        case '<' => Term.iri(graft.normalize.Iri.resolve(base, iriRef().lex))
        case '"' | '\'' => if (isPredicate) fail("literal predicate") else literal()
        case '_' => if (isPredicate) fail("bnode predicate") else bnodeLabel()
        case '(' =>
          if (isPredicate) fail("collection predicate")
          else if (inReified) fail("a collection cannot appear in a reified/triple term")
          else collection()
        case '[' =>
          if (isPredicate) fail("bnode predicate")
          else {
            val n = bnodePropertyList()
            if (inReified && lastWasPropsBnode)
              fail("a bnode property list cannot appear in a reified/triple term")
            n
          }
        case _ =>
          val c = s.charAt(i)
          if (isPredicate && c == 'a' && boundaryAt(i + 1)) { i += 1; Term.iri(RDF_TYPE) }
          else if (!isPredicate && s.startsWith("true", i) && boundaryAt(i + 4)) {
            i += 4; Term.lit("true", Term.XSD_BOOLEAN)
          } else if (!isPredicate && s.startsWith("false", i) && boundaryAt(i + 5)) {
            i += 5; Term.lit("false", Term.XSD_BOOLEAN)
          } else if (!isPredicate && (c.isDigit || c == '+' || c == '-' ||
            (c == '.' && i + 1 < s.length && s.charAt(i + 1).isDigit)))
            numericLiteral()
          else prefixedName()
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
          // bare `~` (no iri/bnode follows): fresh bnode reifier
          val r =
            if (i >= s.length || ".,;]{~|".indexOf(s.charAt(i)) >= 0) freshBnode()
            else {
              val t = term(isPredicate = false, inReified = true)
              if (t.kind != Term.KIND_IRI && t.kind != Term.KIND_BNODE)
                fail("a reifier must be an IRI or blank node")
              t
            }
          out += Triple(r, Term.iri(RDF_REIFIES), Term(Term.KIND_TRIPLE_TERM,
            "<<( " + subj.toNTriples + " " + pred.toNTriples + " " + obj.toNTriples + " )>>",
            "", ""))
          reifier = Some(r)
        } else if (s.startsWith("{|", i)) {
          i += 2
          val r = theReifier()
          skip()
          if (s.startsWith("|}", i)) fail("empty annotation block '{| |}'")
          predicateObjectList(r, inBracket = true)
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
      val ts = term(isPredicate = false, inReified = true); skip()
      if (ts.kind != Term.KIND_IRI && ts.kind != Term.KIND_BNODE)
        fail("triple-term subject must be an IRI or blank node")
      val tp = term(isPredicate = true); skip()
      val to = term(isPredicate = false, inReified = true); skip()
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
      val ts = term(isPredicate = false, inReified = true); skip()
      if (ts.kind == Term.KIND_LIT) fail("reified-triple subject cannot be a literal")
      if (ts.kind == Term.KIND_TRIPLE_TERM)
        fail("reified-triple subject cannot be a triple term")
      val tp = term(isPredicate = true); skip()
      val to = term(isPredicate = false, inReified = true); skip()
      val tt = Term(Term.KIND_TRIPLE_TERM,
        "<<( " + ts.toNTriples + " " + tp.toNTriples + " " + to.toNTriples + " )>>", "", "")
      val reifier =
        if (i < s.length && s.charAt(i) == '~') {
          i += 1; skip()
          // bare `~` (fresh bnode reifier) when no iri/bnode follows
          if (s.startsWith(">>", i)) freshBnode()
          else {
            val r = term(isPredicate = false, inReified = true)
            if (r.kind != Term.KIND_IRI && r.kind != Term.KIND_BNODE)
              fail("a reifier must be an IRI or blank node")
            r
          }
        } else freshBnode()
      skip()
      if (!s.startsWith(">>", i)) fail("expected '>>' closing reified triple")
      i += 2
      out += Triple(reifier, Term.iri(RDF_REIFIES), tt)
      lastWasPropsBnode = true // `<< s p o >> .` may stand alone
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
      if (i < s.length && s.charAt(i) == ']') { i += 1; lastWasPropsBnode = false; return node }
      predicateObjectList(node, inBracket = true)
      skip()
      if (i >= s.length || s.charAt(i) != ']') fail("unterminated '['")
      i += 1
      lastWasPropsBnode = true
      node
    }

    /** Turtle numeric shorthand, parsed with the strict INTEGER / DECIMAL /
     * DOUBLE terminals: a '.' belongs to the number only when followed by a
     * digit (or by a well-formed exponent — `1.e0` is a legal DOUBLE);
     * an exponent needs ≥1 digit (`1e` is an error downstream). */
    private def numericLiteral(): Term = {
      val start = i
      if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
      var nBefore = 0
      while (i < s.length && s.charAt(i).isDigit) { i += 1; nBefore += 1 }
      var hasDot = false
      var nAfter = 0
      if (i < s.length && s.charAt(i) == '.') {
        val j = i + 1
        val digitAfter = j < s.length && s.charAt(j).isDigit
        val expAfter = nBefore > 0 && j < s.length &&
          (s.charAt(j) == 'e' || s.charAt(j) == 'E') && expFollows(j)
        if (digitAfter || expAfter) {
          hasDot = true
          i += 1
          while (i < s.length && s.charAt(i).isDigit) { i += 1; nAfter += 1 }
        }
      }
      var isDouble = false
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E') && expFollows(i)) {
        isDouble = true
        i += 1
        if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      val w = s.substring(start, i)
      if (nBefore == 0 && nAfter == 0) fail(s"malformed number '$w'")
      if (isDouble) Term.lit(w, Term.XSD_DOUBLE)
      else if (hasDot) Term.lit(w, Term.XSD_DECIMAL)
      else Term.lit(w, Term.XSD_INTEGER)
    }

    /** Is position j the start of a well-formed EXPONENT (`[eE][+-]?\d+`)? */
    private def expFollows(j: Int): Boolean = {
      var k = j + 1
      if (k < s.length && (s.charAt(k) == '+' || s.charAt(k) == '-')) k += 1
      k < s.length && s.charAt(k).isDigit
    }

    /** PNAME_NS / PNAME_LN with the strict PN_LOCAL terminal, including
     * %-encoded sequences (kept verbatim) and PN_LOCAL_ESC backslash
     * escapes (unescaped into the expanded IRI). */
    private def prefixedName(): Term = {
      val pfx = prefixLabel()
      if (i >= s.length || s.charAt(i) != ':') fail(s"expected term at '${s.substring(i, Math.min(i + 12, s.length))}'")
      i += 1
      val local = pnLocal()
      prefixes.get(pfx) match {
        case Some(ns) => Term.iri(ns + local)
        case None => fail(s"undeclared prefix '$pfx:'")
      }
    }

    private val LocalEsc = "_~.-!$&'()*+,;=/?#@%"

    private def pnLocal(): String = {
      val sb = new StringBuilder
      def plx(): Boolean =
        if (i >= s.length) false
        else s.charAt(i) match {
          case '%' =>
            if (i + 2 >= s.length || Character.digit(s.charAt(i + 1), 16) < 0 ||
              Character.digit(s.charAt(i + 2), 16) < 0) fail("bad %-sequence in local name")
            sb.append(s.substring(i, i + 3)); i += 3; true
          case '\\' =>
            if (i + 1 >= s.length || LocalEsc.indexOf(s.charAt(i + 1)) < 0)
              fail("bad local-name escape")
            sb.append(s.charAt(i + 1)); i += 2; true
          case _ => false
        }
      // first char: PN_CHARS_U | ':' | digit | PLX; none ⇒ empty local name
      if (i < s.length) {
        val cp = s.codePointAt(i)
        if (Chars.pnCharsU(cp) || cp == ':' || (cp >= '0' && cp <= '9')) {
          sb.appendAll(Character.toChars(cp)); i += Character.charCount(cp)
        } else if (!plx()) return ""
      } else return ""
      var going = true
      while (going && i < s.length) {
        val cp = s.codePointAt(i)
        if (Chars.pnChars(cp) || cp == ':') {
          sb.appendAll(Character.toChars(cp)); i += Character.charCount(cp)
        } else if (cp == '.') {
          // a run of dots stays in the name only if a name char follows it
          var j = i
          while (j < s.length && s.charAt(j) == '.') j += 1
          val cont = j < s.length && {
            val c2 = s.codePointAt(j)
            Chars.pnChars(c2) || c2 == ':' || c2 == '%' || c2 == '\\'
          }
          if (cont) { while (i < j) { sb.append('.'); i += 1 } } else going = false
        } else if (cp == '%' || cp == '\\') plx()
        else going = false
      }
      sb.toString
    }

    private def iriRef(): Term = {
      if (s.charAt(i) != '<') fail("expected '<'")
      val end = s.indexOf('>', i)
      if (end < 0) fail("unterminated IRI")
      val iri = s.substring(i + 1, end)
      i = end + 1
      Term.iri(Chars.unescapeIri(iri))
    }

    private def bnodeLabel(): Term = {
      if (i + 1 >= s.length || s.charAt(i + 1) != ':') fail("bad bnode label")
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

    /** Close of a long string: the FIRST run of ≥3 quotes outside an
     * escape (grammar: a content quote run must be followed by a
     * non-quote char, so `"""abc""""` is content `abc` + close + a stray
     * quote = syntax error downstream — the bad-string-06/07 cases). */
    private def longStringEnd(q: Char): Int = {
      var k = i
      while (k < s.length) {
        val c = s.charAt(k)
        if (c == '\\') k += 2
        else if (c == q) {
          var n = 0
          while (k + n < s.length && s.charAt(k + n) == q) n += 1
          if (n >= 3) return k
          k += n
        } else k += 1
      }
      -1
    }

    private def literal(): Term = {
      val q = s.charAt(i)
      val longQ = s.startsWith(q.toString * 3, i)
      val lex =
        if (longQ) {
          i += 3
          val end = longStringEnd(q)
          if (end < 0) fail("unterminated long string")
          val raw = s.substring(i, end)
          i = end + 3
          Chars.unescapeString(raw)
        } else {
          i += 1
          val sb = new StringBuilder
          while (i < s.length && s.charAt(i) != q) {
            val c = s.charAt(i)
            if (c == '\n' || c == '\r') fail("newline in single-quoted string")
            if (c == '\\') {
              if (i + 1 >= s.length) fail("bad escape")
              sb.append(c).append(s.charAt(i + 1)); i += 2
            } else { sb.append(c); i += 1 }
          }
          if (i >= s.length) fail("unterminated string")
          i += 1
          Chars.unescapeString(sb.toString)
        }
      if (i < s.length && s.charAt(i) == '@') {
        i += 1
        val start = i
        while (i < s.length &&
          ((s.charAt(i).isLetterOrDigit && s.charAt(i) < 128) || s.charAt(i) == '-')) i += 1
        val tag = s.substring(start, i)
        if (!Chars.validLangTag(tag)) fail(s"invalid language tag '@$tag'")
        Term.langLit(lex, tag)
      } else if (i + 1 < s.length && s.charAt(i) == '^' && s.charAt(i + 1) == '^') {
        i += 2
        skip()
        val dt = term(isPredicate = false)
        if (dt.kind != Term.KIND_IRI) fail("datatype must be an IRI")
        if (dt.lex == Chars.RDF_LANG_STRING || dt.lex == Chars.RDF_DIR_LANG_STRING)
          fail("rdf:langString/dirLangString literals need a language tag, not ^^")
        Term.lit(lex, dt.lex)
      } else Term.string(lex)
    }
  }
}
