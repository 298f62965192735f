package graft.normalize

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.model.Term

/**
 * Pure term-normalization functions — the distributed twin of Jena RIOT's
 * value canonicalization (reference:
 * jena-arq/src/main/java/org/apache/jena/riot/process/normalize/NormalizeValue.java:42–224,
 * "General" style per NormalizeRDFTerms.java:112–115,234–263). All functions are
 * deterministic, side-effect-free `String => String` so they run as null-safe
 * UDFs / map functions inside executors with no shared state.
 *
 * After this stage one lexical form exists per value, so value-equality is
 * plain string equality — the engine's joins and dedup stay equi-joins
 * (mirrors GraphMemValue's indexing-by-value, GraphMemFactory.java:76–93).
 */
object Literals {

  /** xsd:boolean — "1"->"true", "0"->"false", else unchanged
   * (NormalizeValue.dtBoolean). */
  def canonBoolean(lex: String): String = lex match {
    case "1" => "true"
    case "0" => "false"
    case _   => lex
  }

  /** xsd:integer family — drop leading '+' and leading zeros via BigInteger
   * (NormalizeValue.dtInteger). Invalid forms returned unchanged. */
  def canonInteger(lex: String): String =
    try new BigInteger(lex.trim).toString
    catch { case _: NumberFormatException => lex }

  /** xsd:decimal, Turtle/General style — stripTrailingZeros + plain string,
   * always keeping a decimal point (NormalizeValue.dtDecimalTTL). */
  def canonDecimal(lex: String): String =
    try {
      var s = new JBigDecimal(lex.trim).stripTrailingZeros.toPlainString
      if (!s.contains('.')) s = s + ".0"
      s
    } catch { case _: NumberFormatException => lex }

  /** xsd:double, Turtle/General style (NormalizeValue.dtDoubleTTL →
   * XSDNumUtils.stringForm(double)): Java Double.toString, plus "e0" when
   * Java printed no exponent; INF/NaN per XSD. */
  def canonDouble(lex: String): String =
    try {
      val d = parseXsdDouble(lex.trim)
      if (d.isInfinity) { if (d < 0) "-INF" else "INF" }
      else if (d.isNaN) "NaN"
      else {
        val x = java.lang.Double.toString(d)
        if (x.indexOf('e') >= 0 || x.indexOf('E') >= 0) x else x + "e0"
      }
    } catch { case _: NumberFormatException => lex }

  /** xsd:float, Turtle/General style — Java Float.toString as-is
   * (XSDNumUtils.stringForm(float): low-precision values keep Java form). */
  def canonFloat(lex: String): String =
    try {
      val f = parseXsdFloat(lex.trim)
      if (f.isInfinity) { if (f < 0) "-INF" else "INF" }
      else if (f.isNaN) "NaN"
      else java.lang.Float.toString(f)
    } catch { case _: NumberFormatException => lex }

  private def parseXsdDouble(s: String): Double = s match {
    case "INF" | "+INF" | "inf" | "+inf" => Double.PositiveInfinity
    case "-INF" | "-inf"                 => Double.NegativeInfinity
    case "NaN"                           => Double.NaN
    case "-NaN" | "+NaN"                 => throw new NumberFormatException(s)
    case _                               => java.lang.Double.parseDouble(s)
  }
  private def parseXsdFloat(s: String): Float = s match {
    case "INF" | "+INF" | "inf" | "+inf" => Float.PositiveInfinity
    case "-INF" | "-inf"                 => Float.NegativeInfinity
    case "NaN"                           => Float.NaN
    case "-NaN" | "+NaN"                 => throw new NumberFormatException(s)
    case _                               => java.lang.Float.parseFloat(s)
  }

  /** xsd:dateTime (and date/time/g*) — the only canonical-form variability is
   * fractional seconds: strip trailing zeros; drop the '.' if nothing remains
   * (NormalizeValue.dtAnyDateTime). Works on the raw lexical form — no
   * calendar math needed. */
  def canonDateTime(lex: String): String = {
    val dot = lex.indexOf('.')
    if (dot < 0) return lex
    // fractional seconds run from after '.' while digits last
    var end = dot + 1
    while (end < lex.length && Character.isDigit(lex.charAt(end))) end += 1
    var last = end - 1
    while (last > dot && lex.charAt(last) == '0') last -= 1
    val head = lex.substring(0, if (last == dot) dot else last + 1)
    head + lex.substring(end)
  }

  /** Dispatch on datatype IRI — the General-style handler table
   * (NormalizeRDFTerms.java:234–263). Unknown datatypes pass through. */
  def canonLiteral(lex: String, dt: String): String = {
    import Term._
    dt match {
      case XSD_BOOLEAN => canonBoolean(lex)
      case XSD_DECIMAL => canonDecimal(lex)
      case XSD_DOUBLE  => canonDouble(lex)
      case XSD_FLOAT   => canonFloat(lex)
      case XSD_DATETIME => canonDateTime(lex)
      case d if d == XSD_INTEGER ||
        d.startsWith(XSD) && Set("int", "long", "short", "byte",
          "unsignedInt", "unsignedLong", "unsignedShort", "unsignedByte",
          "nonPositiveInteger", "nonNegativeInteger",
          "positiveInteger", "negativeInteger").contains(d.stripPrefix(XSD)) =>
        canonInteger(lex)
      case _ => lex
    }
  }
}

/** RFC 5646 language-tag case canonicalization — the reference's rule
 * (jena-langtag/src/main/java/org/apache/jena/langtag/InternalLangTag.java:62–70,
 * applied by StreamCanonicalLangTag): first subtag lowercase; each later
 * subtag: 2 chars → UPPERCASE (region), 4 chars → Titlecase (script),
 * else lowercase. */
object LangTags {
  /** Single source of truth lives on Term (applied at construction so tag
   * equality is string equality engine-wide). */
  def canonical(tag: String): String = Term.canonLangTag(tag)
}

/**
 * RFC 3986 §5.2 reference resolution with dot-segment removal — mirrors the
 * reference's always-applied resolution step
 * (jena-core/src/main/java/org/apache/jena/irix/IRIs.java:112–161 delegating to
 * jena-iri3986 AlgResolveIRI.java:36–59). Syntax-based normalization
 * (scheme/host case, percent-encoding) is deliberately NOT applied — the
 * reference keeps it as a separate, not-auto-applied step (IRI3986.java:569–624).
 */
object Iri {

  final case class Parts(scheme: String, authority: String, path: String,
                         query: String, fragment: String) {
    def recompose: String = {
      val sb = new StringBuilder
      if (scheme != null) sb.append(scheme).append(':')
      if (authority != null) sb.append("//").append(authority)
      sb.append(path)
      if (query != null) sb.append('?').append(query)
      if (fragment != null) sb.append('#').append(fragment)
      sb.toString
    }
  }

  /** RFC 3986 appendix-B style split (null = component absent). */
  def parse(iri: String): Parts = {
    var rest = iri
    var fragment: String = null
    val h = rest.indexOf('#')
    if (h >= 0) { fragment = rest.substring(h + 1); rest = rest.substring(0, h) }
    var query: String = null
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    var scheme: String = null
    val c = rest.indexOf(':')
    // a scheme must start with ALPHA and precede any '/'
    if (c > 0 && rest.substring(0, c).matches("[A-Za-z][A-Za-z0-9+.-]*") &&
        (rest.indexOf('/') < 0 || c < rest.indexOf('/'))) {
      scheme = rest.substring(0, c); rest = rest.substring(c + 1)
    }
    var authority: String = null
    if (rest.startsWith("//")) {
      val after = rest.substring(2)
      val slash = after.indexOf('/')
      if (slash >= 0) { authority = after.substring(0, slash); rest = after.substring(slash) }
      else { authority = after; rest = "" }
    }
    Parts(scheme, authority, rest, query, fragment)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next >= 0) { out += in.substring(0, next); in = in.substring(next) }
        else { out += in; in = "" }
      }
    }
    out.mkString
  }

  private def merge(base: Parts, refPath: String): String =
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val i = base.path.lastIndexOf('/')
      if (i < 0) refPath else base.path.substring(0, i + 1) + refPath
    }

  /** RFC 3986 §5.2.2 transform-references (strict). */
  def resolve(base: String, ref: String): String = {
    val b = parse(base)
    val r = parse(ref)
    val t =
      if (r.scheme != null)
        Parts(r.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.authority != null)
        Parts(b.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.path.isEmpty)
        Parts(b.scheme, b.authority, b.path, if (r.query != null) r.query else b.query, r.fragment)
      else if (r.path.startsWith("/"))
        Parts(b.scheme, b.authority, removeDotSegments(r.path), r.query, r.fragment)
      else
        Parts(b.scheme, b.authority, removeDotSegments(merge(b, r.path)), r.query, r.fragment)
    t.recompose
  }
}

/**
 * Deterministic, document-scoped blank-node labeling. The reference hashes
 * (per-run seed ‖ label) with MurmurHash3-128 into a 32-hex-lowercase label
 * (jena-arq/src/main/java/org/apache/jena/riot/lang/BlankNodeAllocatorHash.java:98–131,
 * scope policy LabelToNode.createScopeByDocumentHash, LabelToNode.java:48).
 * We keep the exact contract — same label within one document ⇒ same node,
 * same label across documents ⇒ distinct nodes, 32-hex label shape —
 * but derive the seed from the document scope (repo,path,commit) and use
 * SHA-256 (available everywhere) instead of a random-seeded MurmurHash3, so
 * labels are reproducible across runs and partitionings (a distributed
 * pipeline cannot carry driver-local random seeds).
 */
object BNodes {
  def label(scope: String, srcLabel: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(scope.getBytes(StandardCharsets.UTF_8))
    md.update(0.toByte)
    md.update(srcLabel.getBytes(StandardCharsets.UTF_8))
    val d = md.digest()
    val sb = new StringBuilder(32)
    var i = 0
    while (i < 16) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }
}
