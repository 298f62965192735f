package graft.riot

/**
 * Terminal character classes and strict unescapers of the W3C
 * Turtle/TriG/N-Triples/N-Quads grammars (reference: the `PN_CHARS*`,
 * `IRIREF`, `ECHAR`/`UCHAR`, `LANGTAG`, `BLANK_NODE_LABEL` productions in
 * riot/tokens/TokenizerText.java). Shared by the strict riot parsers —
 * the W3C parser suites' negative-syntax cases hinge on exactly these
 * classes.
 */
object Chars {

  val RDF_LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
  val RDF_DIR_LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#dirLangString"

  def pnCharsBase(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= 0x00C0 && cp <= 0x00D6) || (cp >= 0x00D8 && cp <= 0x00F6) ||
      (cp >= 0x00F8 && cp <= 0x02FF) || (cp >= 0x0370 && cp <= 0x037D) ||
      (cp >= 0x037F && cp <= 0x1FFF) || (cp >= 0x200C && cp <= 0x200D) ||
      (cp >= 0x2070 && cp <= 0x218F) || (cp >= 0x2C00 && cp <= 0x2FEF) ||
      (cp >= 0x3001 && cp <= 0xD7FF) || (cp >= 0xF900 && cp <= 0xFDCF) ||
      (cp >= 0xFDF0 && cp <= 0xFFFD) || (cp >= 0x10000 && cp <= 0xEFFFF)

  def pnCharsU(cp: Int): Boolean = pnCharsBase(cp) || cp == '_'

  def pnChars(cp: Int): Boolean =
    pnCharsU(cp) || cp == '-' || (cp >= '0' && cp <= '9') || cp == 0x00B7 ||
      (cp >= 0x0300 && cp <= 0x036F) || (cp >= 0x203F && cp <= 0x2040)

  private def digit(cp: Int): Boolean = cp >= '0' && cp <= '9'

  /** BLANK_NODE_LABEL body (the part after `_:`):
   * (PN_CHARS_U | [0-9]) ((PN_CHARS | '.')* PN_CHARS)? */
  def validBnodeLabel(l: String): Boolean = {
    if (l.isEmpty) return false
    val cps = l.codePoints().toArray
    if (!pnCharsU(cps(0)) && !digit(cps(0))) return false
    if (cps.length == 1) return true
    if (!pnChars(cps.last)) return false
    cps.slice(1, cps.length - 1).forall(cp => pnChars(cp) || cp == '.')
  }

  /** LANGTAG `@[a-zA-Z]{1,8}('-'[a-zA-Z0-9]{1,8})*`, optionally with the
   * RDF 1.2 initial-text-direction suffix `--ltr` / `--rtl` (the RDF 1.2
   * grammars cap subtags at 8 chars — ntriples-langdir-bad-4). */
  def validLangTag(tag: String): Boolean = {
    val (lang, dirOk) = tag.indexOf("--") match {
      case -1 => (tag, true)
      case k => (tag.substring(0, k),
        tag.substring(k + 2) == "ltr" || tag.substring(k + 2) == "rtl")
    }
    dirOk && lang.nonEmpty && {
      val parts = lang.split("-", -1)
      parts.head.nonEmpty && parts.head.length <= 8 &&
        parts.head.forall(c => c.isLetter && c < 128) &&
        parts.tail.forall(p => p.nonEmpty && p.length <= 8 &&
          p.forall(c => c.isLetterOrDigit && c < 128))
    }
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def parseHex(s: String, from: Int, n: Int): Int = {
    if (from + n > s.length) throw bad(s"truncated \\u escape in '$s'")
    var v = 0
    var k = 0
    while (k < n) {
      val h = hexVal(s.charAt(from + k))
      if (h < 0) throw bad(s"bad hex digit in escape in '$s'")
      v = (v << 4) | h
      k += 1
    }
    v
  }

  private def bad(msg: String) = new IllegalArgumentException(msg)

  /** A numeric escape must name a Unicode scalar value — lone surrogates
   * and out-of-range code points are syntax errors (the suites'
   * bad-numeric-escape cases; the reference checks in TokenizerText). */
  private def scalarChars(cp: Int): Array[Char] = {
    if (cp >= 0xD800 && cp <= 0xDFFF) throw bad(f"surrogate code point U+$cp%04X in escape")
    if (cp > 0x10FFFF || cp < 0) throw bad(f"code point out of range in escape")
    Character.toChars(cp)
  }

  /** Strict IRIREF body unescape: only \uXXXX / \UXXXXXXXX escapes are
   * legal, and neither the raw nor the unescaped text may contain
   * control chars, space, or `<>"{}|^`\\`. */
  def unescapeIri(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') {
        if (i + 1 >= s.length) throw bad("trailing backslash in IRI")
        s.charAt(i + 1) match {
          case 'u' => sb.appendAll(scalarChars(parseHex(s, i + 2, 4))); i += 6
          case 'U' => sb.appendAll(scalarChars(parseHex(s, i + 2, 8))); i += 10
          case e => throw bad(s"illegal IRI escape '\\$e'")
        }
      } else { sb.append(c); i += 1 }
    }
    val out = sb.toString
    out.foreach { c =>
      if (c <= 0x20 || "<>\"{}|^`\\".indexOf(c) >= 0)
        throw bad(f"illegal character U+${c.toInt}%04X in IRI <$out>")
    }
    out
  }

  /** Strict string-literal unescape: ECHAR (tbnrf"'\\) + UCHAR only. */
  def unescapeString(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') {
        if (i + 1 >= s.length) throw bad("trailing backslash in string")
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' => sb.appendAll(scalarChars(parseHex(s, i + 2, 4))); i += 6
          case 'U' => sb.appendAll(scalarChars(parseHex(s, i + 2, 8))); i += 10
          case e => throw bad(s"illegal string escape '\\$e'")
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** N-Triples/N-Quads require ABSOLUTE IRIs (scheme ':' ...). */
  def requireAbsolute(iri: String): String = {
    val ok = iri.nonEmpty && iri.head.isLetter && {
      val k = iri.indexOf(':')
      k > 0 && iri.substring(0, k).forall(c =>
        c.isLetterOrDigit || c == '+' || c == '-' || c == '.')
    }
    if (!ok) throw bad(s"IRI is not absolute: <$iri>")
    iri
  }
}
