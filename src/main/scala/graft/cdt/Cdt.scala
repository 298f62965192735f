package graft.cdt

import scala.collection.mutable.ListBuffer

import graft.model.Term
import graft.shacl.Xsd

/**
 * Composite datatypes (CDTs): the cdt:List / cdt:Map LITERAL datatypes of
 * the SPARQL-CDTs proposal (reference: jena-arq org/apache/jena/cdt/ —
 * CompositeDatatypeList/Map, Grammar/CDTs/cdt_literals.jj). A CDT value
 * is a literal whose lexical form holds RDF terms in a Turtle-ish
 * bracket syntax: `[1, "a", <http://x>, null, [2]]` and
 * `{"k": 1, <http://k2>: [..]}`.
 *
 *  - equality is by VALUE, elementwise/entrywise (nested numerics compare
 *    numerically: [1] = [01]); map KEYS compare by term identity
 *  - `null` elements are errors to access and equal only to null
 *  - serialization re-renders elements Turtle-style with the reference's
 *    abbreviations (bare valid-lexical integer/decimal/double and
 *    true/false booleans), preserving element lexical forms
 */
object Cdt {

  val NS = "http://w3id.org/awslabs/neptune/SPARQL-CDTs/"
  val LIST: String = NS + "List"
  val MAP: String = NS + "Map"

  /** One list element / map value: null or an RDF term (nested CDTs stay
   * terms with dt cdt:List / cdt:Map). */
  sealed trait CV
  case object CNull extends CV
  final case class CTerm(t: Term) extends CV

  final class CdtParseException(msg: String) extends RuntimeException(msg)

  def isList(t: Term): Boolean = t != null && t.isLiteral && t.dt == LIST
  def isMap(t: Term): Boolean = t != null && t.isLiteral && t.dt == MAP
  def isCdt(t: Term): Boolean = isList(t) || isMap(t)

  // ==================== parsing ====================
  def parseList(lex: String): List[CV] = {
    val p = new P(lex)
    val r = p.list()
    p.end()
    r
  }

  def parseMap(lex: String): List[(Term, CV)] = {
    val p = new P(lex)
    val r = p.map()
    p.end()
    r
  }

  private final class P(s: String) {
    private var i = 0
    private def err(m: String): Nothing = throw new CdtParseException(s"$m at $i in: $s")
    private def eof = i >= s.length
    private def cur = s.charAt(i)
    private def at(k: Int) = if (i + k < s.length) s.charAt(i + k) else ' '
    private def ws(): Unit =
      while (!eof && (cur == ' ' || cur == '\t' || cur == '\n' || cur == '\r')) i += 1
    def end(): Unit = { ws(); if (!eof) err("trailing content") }

    def list(): List[CV] = {
      ws(); if (eof || cur != '[') err("expected '['")
      i += 1
      val out = ListBuffer[CV]()
      ws()
      if (!eof && cur == ']') { i += 1; return out.toList }
      out += value()
      ws()
      while (!eof && cur == ',') { i += 1; out += value(); ws() }
      if (eof || cur != ']') err("expected ']'")
      i += 1
      out.toList
    }

    def map(): List[(Term, CV)] = {
      ws(); if (eof || cur != '{') err("expected '{'")
      i += 1
      val out = ListBuffer[(Term, CV)]()
      ws()
      if (!eof && cur == '}') { i += 1; return out.toList }
      def entry(): Unit = {
        val k = value() match {
          case CTerm(t) if (t.isIri || t.isLiteral) && !isCdt(t) => t
          case _ => err("invalid map key")
        }
        ws(); if (eof || cur != ':') err("expected ':'")
        i += 1
        val v = value()
        if (out.exists(_._1 == k)) err("map with non-unique key")
        out += ((k, v))
      }
      entry(); ws()
      while (!eof && cur == ',') { i += 1; entry(); ws() }
      if (eof || cur != '}') err("expected '}'")
      i += 1
      out.toList
    }

    private def value(): CV = {
      ws()
      if (eof) err("expected value")
      cur match {
        case '[' => CTerm(listTerm(list()))
        case '{' => CTerm(mapTerm(map()))
        case '<' => CTerm(iriRef())
        case '_' if at(1) == ':' => CTerm(bnode())
        case '"' | '\'' => CTerm(rdfLiteral())
        case 'n' if s.startsWith("null", i) && !isNameChar(at(4)) =>
          i += 4; CNull
        case 't' if s.startsWith("true", i) && !isNameChar(at(4)) =>
          i += 4; CTerm(Term.lit("true", Term.XSD_BOOLEAN))
        case 'f' if s.startsWith("false", i) && !isNameChar(at(5)) =>
          i += 5; CTerm(Term.lit("false", Term.XSD_BOOLEAN))
        case c if c == '+' || c == '-' || c == '.' || c.isDigit => CTerm(numeric())
        case c => err(s"unexpected char '$c'")
      }
    }

    private def isNameChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

    private def iriRef(): Term = {
      i += 1
      val sb = new StringBuilder
      while (!eof && cur != '>') {
        val c = cur
        if (c == '\\') {
          val e = at(1)
          if (e == 'u' || e == 'U') { i += 1; sb.appendAll(Character.toChars(uchar())) }
          else err("bad IRI escape")
        } else if (c <= ' ' || "\"{}|^`".indexOf(c) >= 0) err("bad IRI char")
        else { sb.append(c); i += 1 }
      }
      if (eof) err("unterminated IRI")
      i += 1
      Term.iri(sb.toString)
    }

    private def bnode(): Term = {
      i += 2
      val sb = new StringBuilder
      if (eof || !(cur.isLetterOrDigit || cur == '_')) err("bad bnode label")
      while (!eof && (cur.isLetterOrDigit || cur == '_' || cur == '-' || cur == '.')) {
        sb.append(cur); i += 1
      }
      while (sb.nonEmpty && sb.last == '.') { sb.deleteCharAt(sb.length - 1); i -= 1 }
      Term.bnode(sb.toString)
    }

    private def uchar(): Int = {
      val n = if (cur == 'u') 4 else 8
      i += 1
      var v = 0
      var k = 0
      while (k < n) {
        if (eof) err("bad \\u escape")
        val c = cur
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else err("bad hex")
        v = (v << 4) | d; i += 1; k += 1
      }
      if (v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) err("bad codepoint")
      v
    }

    private def stringBody(q: Char, long: Boolean): String = {
      val sb = new StringBuilder
      while (true) {
        if (eof) err("unterminated string")
        val c = cur
        if (c == q) {
          if (!long) { i += 1; return sb.toString }
          if (at(1) == q && at(2) == q) { i += 3; return sb.toString }
          sb.append(c); i += 1
        } else if (c == '\\') {
          i += 1
          if (eof) err("unterminated escape")
          cur match {
            case 't' => sb.append('\t'); i += 1
            case 'b' => sb.append('\b'); i += 1
            case 'n' => sb.append('\n'); i += 1
            case 'r' => sb.append('\r'); i += 1
            case 'f' => sb.append('\f'); i += 1
            case '"' => sb.append('"'); i += 1
            case '\'' => sb.append('\''); i += 1
            case '\\' => sb.append('\\'); i += 1
            case 'u' | 'U' => sb.appendAll(Character.toChars(uchar()))
            case e => err(s"bad escape \\$e")
          }
        } else if (!long && (c == '\n' || c == '\r')) err("newline in string")
        else { sb.append(c); i += 1 }
      }
      throw new IllegalStateException
    }

    private def rdfLiteral(): Term = {
      val q = cur
      val lex =
        if (at(1) == q && at(2) == q) { i += 3; stringBody(q, long = true) }
        else { i += 1; stringBody(q, long = false) }
      if (!eof && cur == '@') {
        i += 1
        val sb = new StringBuilder
        if (eof || !(cur.isLetter && cur < 128)) err("bad langtag")
        while (!eof && ((cur.isLetterOrDigit && cur < 128) || cur == '-')) {
          sb.append(cur); i += 1
        }
        Term(Term.KIND_LIT, lex, graft.riot.Chars.RDF_LANG_STRING,
          Term.canonLangTag(sb.toString))
      } else if (!eof && cur == '^' && at(1) == '^') {
        i += 2
        ws()
        if (eof || cur != '<') err("expected datatype IRI")
        Term.lit(lex, iriRef().lex)
      } else Term.string(lex)
    }

    private def numeric(): Term = {
      val start = i
      if (cur == '+' || cur == '-') i += 1
      var before = 0
      while (!eof && cur.isDigit) { before += 1; i += 1 }
      var dec = false
      if (!eof && cur == '.' && at(1).isDigit) {
        dec = true; i += 1
        while (!eof && cur.isDigit) i += 1
      }
      var dbl = false
      if (!eof && (cur == 'e' || cur == 'E')) {
        dbl = true; i += 1
        if (!eof && (cur == '+' || cur == '-')) i += 1
        if (eof || !cur.isDigit) err("bad exponent")
        while (!eof && cur.isDigit) i += 1
      }
      val lex = s.substring(start, i)
      if (before == 0 && !dec) err("bad number")
      val dt = if (dbl) Term.XSD_DOUBLE
               else if (dec) Term.XSD_DECIMAL
               else Term.XSD_INTEGER
      Term.lit(lex, dt)
    }
  }

  // ==================== serialization ====================
  private val INT_RX = "[+-]?[0-9]+".r
  private val DEC_RX = "[+-]?[0-9]*\\.[0-9]+".r
  private val DBL_RX = "[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)[eE][+-]?[0-9]+".r

  /** Turtle-style rendering of one element (reference:
   * NodeFmtLib.strTTL — abbreviated numerics/booleans, nested CDT
   * literals keep their lexical form verbatim). */
  def elementLex(t: Term): String = {
    if (t.isIri || t.isBNode || t.kind == Term.KIND_TRIPLE_TERM) return t.toNTriples
    if (isCdt(t)) return t.lex
    t.dt match {
      case Term.XSD_INTEGER if INT_RX.matches(t.lex) => t.lex
      case Term.XSD_DECIMAL if DEC_RX.matches(t.lex) => t.lex
      case Term.XSD_DOUBLE if DBL_RX.matches(t.lex) => t.lex
      case Term.XSD_BOOLEAN if t.lex == "true" || t.lex == "false" => t.lex
      case _ => t.toNTriples
    }
  }

  private def cvLex(v: CV): String = v match {
    case CNull => "null"
    case CTerm(t) => elementLex(t)
  }

  def writeList(es: Seq[CV]): String =
    es.map(cvLex).mkString("[", ", ", "]")

  def writeMap(es: Seq[(Term, CV)]): String =
    es.map { case (k, v) => elementLex(k) + " : " + cvLex(v) }
      .mkString("{", ", ", "}")

  def listTerm(es: Seq[CV]): Term = Term(Term.KIND_LIT, writeList(es), LIST, "")
  def mapTerm(es: Seq[(Term, CV)]): Term = Term(Term.KIND_LIT, writeMap(es), MAP, "")

  // ==================== value equality ====================
  /** sameValueAs for element/value terms, three-valued: Some(true/false)
   * or None = eval error. Blank nodes are comparable only to THE SAME
   * blank node (anything else errors — reference
   * CompositeDatatypeList.isEqual:171–181); numerics/booleans/dateTimes
   * compare by value; nested CDTs recurse. */
  def sameValue(a: Term, b: Term): Option[Boolean] = {
    if (a.isBNode || b.isBNode)
      return if (a == b) Some(true) else None
    if (a.kind != b.kind) return Some(false)
    if (!a.isLiteral) return Some(a.lex == b.lex)
    if (isList(a) && isList(b)) return listEqLex(a.lex, b.lex)
    if (isMap(a) && isMap(b)) return mapEqLex(a.lex, b.lex)
    if (isCdt(a) || isCdt(b)) return Some(false)
    if (a.lang.nonEmpty || b.lang.nonEmpty)
      return Some(a.lang.equalsIgnoreCase(b.lang) && a.lex == b.lex && a.dt == b.dt)
    Xsd.compare(a, b) match {
      case Some(c) => Some(c == 0)
      case None => Some(a.dt == b.dt && a.lex == b.lex)
    }
  }

  private def cvEq(a: CV, b: CV): Option[Boolean] = (a, b) match {
    case (CNull, CNull) => Some(true)
    case (CTerm(x), CTerm(y)) => sameValue(x, y)
    case _ => Some(false)
  }

  /** None = eval error (malformed literal, or a blank-node comparison). */
  def listEqLex(la: String, lb: String): Option[Boolean] =
    try {
      val (a, b) = (parseList(la), parseList(lb))
      if (a.size != b.size) return Some(false)
      var it = a.lazyZip(b).iterator
      while (it.hasNext) {
        val (x, y) = it.next()
        cvEq(x, y) match {
          case None => return None
          case Some(false) => return Some(false)
          case _ =>
        }
      }
      Some(true)
    } catch { case _: CdtParseException => None }

  def mapEqLex(la: String, lb: String): Option[Boolean] =
    try {
      val (a, b) = (parseMap(la), parseMap(lb))
      if (a.size != b.size) return Some(false)
      val it = a.iterator
      while (it.hasNext) {
        val (k, v) = it.next()
        b.find(_._1 == k) match {
          case None => return Some(false)
          case Some((_, w)) => cvEq(v, w) match {
            case None => return None
            case Some(false) => return Some(false)
            case _ =>
          }
        }
      }
      Some(true)
    } catch { case _: CdtParseException => None }

  /** Value equality of two cdt literals; None = eval error. */
  def cdtEq(a: Term, b: Term): Option[Boolean] = {
    if (isList(a) && isList(b)) listEqLex(a.lex, b.lex)
    else if (isMap(a) && isMap(b)) mapEqLex(a.lex, b.lex)
    else Some(false) // list vs map: different (disjoint) value spaces
  }

  // ==================== comparison ====================
  /** SPARQL operator comparison of two element terms: Some(sign) when the
   * value spaces are comparable, None otherwise. Nested CDTs recurse with
   * the operator semantics. */
  private def cmpTermsOp(a: Term, b: Term): Option[Int] = {
    if (isList(a) && isList(b)) return cdtCmpOp(a, b)
    if (isMap(a) && isMap(b)) return cdtCmpOp(a, b)
    if (!a.isLiteral || !b.isLiteral) return None
    Xsd.compare(a, b)
  }

  /** List/map less-than semantics (reference CompositeDatatypeList/
   * Map.compare with sortOrderingCompare = false): None = eval error. */
  def cdtCmpOp(a: Term, b: Term): Option[Int] = {
    try {
      if (isList(a) && isList(b)) {
        val (l1, l2) = (parseList(a.lex), parseList(b.lex))
        if (l1.isEmpty || l2.isEmpty) {
          if (l1.nonEmpty) return Some(1)
          if (l2.nonEmpty) return Some(-1)
          return Some(0)
        }
        val n = math.min(l1.size, l2.size)
        var i = 0
        while (i < n) {
          (l1(i), l2(i)) match {
            case (CTerm(x), CTerm(y)) =>
              // two blank nodes are NEVER operator-comparable — even the
              // same one (reference CompositeDatatypeList.compare)
              if (x.isBNode && y.isBNode) return None
              cmpTermsOp(x, y) match {
                case Some(c) if c != 0 => return Some(Integer.signum(c))
                case _ =>
                  sameValue(x, y) match {
                    case Some(true) => // equal, continue
                    case _ => return None
                  }
              }
            case (CNull, CNull) => // equal, continue
            case _ => return None // null vs non-null: not comparable
          }
          i += 1
        }
        Some(Integer.signum(l1.size - l2.size))
      } else if (isMap(a) && isMap(b)) {
        val (m1, m2) = (parseMap(a.lex), parseMap(b.lex))
        if (m1.isEmpty || m2.isEmpty) {
          if (m1.nonEmpty) return Some(1)
          if (m2.nonEmpty) return Some(-1)
          return Some(0)
        }
        val s1 = m1.sortWith((x, y) => keyCmp(x._1, y._1) < 0)
        val s2 = m2.sortWith((x, y) => keyCmp(x._1, y._1) < 0)
        val n = math.min(s1.size, s2.size)
        var i = 0
        while (i < n) {
          val (k1, v1) = s1(i)
          val (k2, v2) = s2(i)
          val kc = keyCmp(k1, k2)
          if (kc != 0) return Some(Integer.signum(kc))
          (v1, v2) match {
            case (CTerm(x), CTerm(y)) =>
              cmpTermsOp(x, y) match {
                case Some(c) if c != 0 => return Some(Integer.signum(c))
                case _ =>
                  sameValue(x, y) match {
                    case Some(true) =>
                    case _ => return None
                  }
              }
            case (CNull, CNull) =>
            case _ => return None
          }
          i += 1
        }
        Some(Integer.signum(s1.size - s2.size))
      } else None // list vs map (or non-CDT): not comparable
    } catch { case _: CdtParseException => None }
  }

  /** Rewrite blank-node labels inside a cdt literal with the document's
   * label mapping — the reference's RIOT integration parses bnodes inside
   * CDT literals through the same per-document label table as the rest of
   * the file, so `_:b` outside and inside one file denote ONE bnode while
   * two files' `_:b`s differ. Malformed literals pass through unchanged. */
  def mapBnodeLabels(t: Term, f: String => String): Term = {
    def term(x: Term): Term =
      if (x.isBNode) Term.bnode(f(x.lex))
      else if (isList(x)) listTerm(parseList(x.lex).map(cv))
      else if (isMap(x)) mapTerm(parseMap(x.lex).map { case (k, v) => (term(k), cv(v)) })
      else x
    def cv(v: CV): CV = v match {
      case CTerm(x) => CTerm(term(x))
      case CNull => CNull
    }
    try term(t) catch { case _: CdtParseException => t }
  }

  /** Map-key total order (reference CDTKeySorter): IRIs before literals,
   * IRIs by string, literals by (datatype, lexical form, language). */
  def keyCmp(a: Term, b: Term): Int = {
    if (a.isIri && !b.isIri) return -1
    if (!a.isIri && b.isIri) return 1
    if (a.isIri) return a.lex.compareTo(b.lex)
    val dc = keyDt(a).compareTo(keyDt(b))
    if (dc != 0) return dc
    val lc = a.lex.compareTo(b.lex)
    if (lc != 0) return lc
    a.lang.compareTo(b.lang)
  }
  private def keyDt(t: Term): String =
    if (t.lang.nonEmpty) graft.riot.Chars.RDF_LANG_STRING
    else if (t.dt.isEmpty) Term.XSD_STRING
    else t.dt

  // ==================== ORDER BY sort encoding ====================
  /** Order-preserving string key for the ORDER BY semantics of CDT
   * literals (reference compare with sortOrderingCompare = true): list
   * elements compare pairwise under the engine's total term order with
   * nulls lowest, then size, then lexical form; maps sort their entries
   * by key first. Encodings use \u0001 (separator) < \u0002 (terminator)
   * < \u0003 (field separator) so prefix comparisons respect order. */
  def orderKey(t: Term): String = {
    try {
      if (isList(t))
        parseList(t.lex).map(cvKey).map(_ + "\u0001").mkString + "\u0002" + t.lex
      else if (isMap(t)) {
        val entries = parseMap(t.lex).sortWith((x, y) => keyCmp(x._1, y._1) < 0)
        entries.map { case (k, v) =>
          keyKey(k) + "\u0002" + cvKey(v) + "\u0001" }.mkString + "\u0002" + t.lex
      } else termOrderKey(t)
    } catch { case _: CdtParseException => "\u0001" + t.lex }
  }

  private def cvKey(v: CV): String = v match {
    case CNull => "0"
    case CTerm(x) => termOrderKey(x)
  }

  private def keyKey(k: Term): String =
    if (k.isIri) "0" + k.lex
    else "1" + keyDt(k) + "\u0003" + k.lex + "\u0003" + k.lang

  /** Engine total term order, string-encoded (mirrors TermCols.sortKey:
   * bnode < IRI < literal; numeric literals first, by value). */
  private def termOrderKey(t: Term): String = {
    if (t.isBNode) return "1" + t.lex
    if (t.isIri) return "2" + t.lex
    if (isCdt(t)) return "35" + orderKey(t)
    val num = try {
      val dt = keyDt(t)
      if (dt.startsWith(Term.XSD) && Xsd.wellFormed(t.lex, dt) &&
          Xsd.lexRegexFor(dt).isDefined && dt != Term.XSD + "boolean" &&
          !dt.endsWith("date") && !dt.endsWith("dateTime") && !dt.endsWith("time"))
        Some(t.lex.trim.toDouble)
      else None
    } catch { case _: NumberFormatException => None }
    num match {
      case Some(d) => "30" + f"${d + 1e15}%030.9f"
      case None => "31" + t.lex + "\u0003" + keyDt(t) + "\u0003" + t.lang
    }
  }
}
