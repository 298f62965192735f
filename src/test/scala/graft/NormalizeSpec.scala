package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{NTriplesEscape, Term, Triple}
import graft.normalize.{BNodes, Iri, LangTags, Literals}

/** Mirrors the reference's normalization rules (FIXTURES.md §5):
 * NormalizeValue.java:42–224 (General style), InternalLangTag.java:62–70,
 * AlgResolveIRI.java:36–59, BlankNodeAllocatorHash.java:98–131.
 * Property tests use a fixed-seed generator (offline cache has no
 * scalatest-scalacheck bridge). */
class NormalizeSpec extends AnyFunSuite {

  // --- integers (NormalizeValue.dtInteger)
  test("integer: strip plus and leading zeros") {
    assert(Literals.canonInteger("+001") == "1")
    assert(Literals.canonInteger("-0042") == "-42")
    assert(Literals.canonInteger("0") == "0")
    assert(Literals.canonInteger("-0") == "0")
    assert(Literals.canonInteger("123456789012345678901234567890") ==
      "123456789012345678901234567890")
    assert(Literals.canonInteger("abc") == "abc") // invalid → unchanged
  }

  // --- decimals (NormalizeValue.dtDecimalTTL: strip trailing zeros, keep a dot)
  test("decimal: TTL canonical form") {
    assert(Literals.canonDecimal("1.50") == "1.5")
    assert(Literals.canonDecimal("1.0") == "1.0")
    assert(Literals.canonDecimal("1") == "1.0")
    assert(Literals.canonDecimal("+01.250") == "1.25")
    assert(Literals.canonDecimal("-0.0") == "0.0")
    assert(Literals.canonDecimal("0.0010") == "0.001")
  }

  // --- doubles (XSDNumUtils.stringForm: Java toString + "e0" when no exponent)
  test("double: TTL canonical form") {
    assert(Literals.canonDouble("1") == "1.0e0")
    assert(Literals.canonDouble("0") == "0.0e0")
    assert(Literals.canonDouble("1e10") == "1.0E10")
    assert(Literals.canonDouble("-2.5") == "-2.5e0")
    assert(Literals.canonDouble("INF") == "INF")
    assert(Literals.canonDouble("-inf") == "-INF")
    assert(Literals.canonDouble("NaN") == "NaN")
    assert(Literals.canonDouble("+NaN") == "+NaN") // invalid per XSD → unchanged
  }

  test("float: Java form kept for low precision") {
    assert(Literals.canonFloat("1") == "1.0")
    assert(Literals.canonFloat("-2.50") == "-2.5")
    assert(Literals.canonFloat("INF") == "INF")
  }

  // --- booleans (NormalizeValue.dtBoolean)
  test("boolean: 1/0 to true/false") {
    assert(Literals.canonBoolean("1") == "true")
    assert(Literals.canonBoolean("0") == "false")
    assert(Literals.canonBoolean("true") == "true")
  }

  // --- dateTime fractional seconds (NormalizeValue.dtAnyDateTime)
  test("dateTime: strip trailing fractional-second zeros") {
    assert(Literals.canonDateTime("2020-01-02T03:04:05.500Z") == "2020-01-02T03:04:05.5Z")
    assert(Literals.canonDateTime("2020-01-02T03:04:05.000Z") == "2020-01-02T03:04:05Z")
    assert(Literals.canonDateTime("2020-01-02T03:04:05Z") == "2020-01-02T03:04:05Z")
    assert(Literals.canonDateTime("2020-01-02T03:04:05.120+01:00") ==
      "2020-01-02T03:04:05.12+01:00")
  }

  // --- lang tags (InternalLangTag.java:62–70)
  test("lang tag canonical case") {
    assert(LangTags.canonical("EN") == "en")
    assert(LangTags.canonical("en-gb") == "en-GB")
    assert(LangTags.canonical("zh-hant-tw") == "zh-Hant-TW")
    assert(LangTags.canonical("DE-latn-de-1996") == "de-Latn-DE-1996")
  }

  // --- IRI resolution (RFC 3986 §5.4 reference examples, AlgResolveIRI)
  test("IRI resolution: RFC 3986 normal examples") {
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      "g:h" -> "g:h", "g" -> "http://a/b/c/g", "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/", "/g" -> "http://a/g", "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y", "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s", "g#s" -> "http://a/b/c/g#s",
      ";x" -> "http://a/b/c/;x", "g;x" -> "http://a/b/c/g;x",
      "" -> "http://a/b/c/d;p?q", "." -> "http://a/b/c/", "./" -> "http://a/b/c/",
      ".." -> "http://a/b/", "../" -> "http://a/b/", "../g" -> "http://a/b/g",
      "../.." -> "http://a/", "../../" -> "http://a/", "../../g" -> "http://a/g",
      // abnormal
      "../../../g" -> "http://a/g", "/./g" -> "http://a/g", "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.", ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..", "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g", "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h", "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y", "g;x=1/../y" -> "http://a/b/c/y",
    )
    for ((ref, expected) <- cases)
      assert(Iri.resolve(base, ref) == expected, s"ref=$ref")
  }

  // --- bnode labels (BlankNodeAllocatorHash semantics)
  test("bnode labels: document-scoped, deterministic, 32 hex") {
    val a = BNodes.label("repo1/f.ttl@c1", "b0")
    val b = BNodes.label("repo1/f.ttl@c1", "b0")
    val c = BNodes.label("repo2/f.ttl@c1", "b0")
    val d = BNodes.label("repo1/f.ttl@c1", "b1")
    assert(a == b); assert(a != c); assert(a != d)
    assert(a.matches("[0-9a-f]{32}"))
  }

  // --- N-Triples formatting & escaping (NodeFormatterNT)
  test("canonical N-Triples formatting") {
    assert(Term.iri("http://x/s").toNTriples == "<http://x/s>")
    assert(Term.bnode("abc").toNTriples == "_:abc")
    assert(Term.string("hi").toNTriples == "\"hi\"")
    assert(Term.langLit("hi", "en-GB").toNTriples == "\"hi\"@en-GB")
    assert(Term.lit("1", Term.XSD_INTEGER).toNTriples ==
      "\"1\"^^<http://www.w3.org/2001/XMLSchema#integer>")
    assert(Term.string("a\"b\\c\nd").toNTriples == "\"a\\\"b\\\\c\\nd\"")
    val t = Triple(Term.iri("http://x/s"), Term.iri("http://x/p"), Term.string("o"))
    assert(t.toNTriples == "<http://x/s> <http://x/p> \"o\" .")
  }

  // --- properties (fixed seed ⇒ reproducible)
  test("property: canonicalization is idempotent") {
    val rnd = new scala.util.Random(42)
    val fixed = Seq("0", "1", "true", "false", "+07", "-0.50", "1e3", "2.5E-4")
    val gens: Seq[() => String] = Seq(
      () => (rnd.nextLong() % 1000000L).toString,
      () => f"${(rnd.nextDouble() - 0.5) * 2e6}%.4f",
      () => fixed(rnd.nextInt(fixed.length)))
    for (_ <- 1 to 500) {
      val lex = gens(rnd.nextInt(gens.length))()
      assert(Literals.canonInteger(Literals.canonInteger(lex)) == Literals.canonInteger(lex))
      assert(Literals.canonDecimal(Literals.canonDecimal(lex)) == Literals.canonDecimal(lex))
      assert(Literals.canonDouble(Literals.canonDouble(lex)) == Literals.canonDouble(lex))
    }
  }

  test("property: escape/unescape roundtrip") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val len = rnd.nextInt(40)
      val s = new String(Array.fill(len) {
        rnd.nextInt(4) match {
          case 0 => Seq('"', '\\', '\n', '\r', '\t', 1.toChar)(rnd.nextInt(6))
          case 1 => (0x20 + rnd.nextInt(0x5f)).toChar
          case _ => rnd.nextPrintableChar()
        }
      })
      assert(NTriplesEscape.unescape(NTriplesEscape.escape(s)) == s)
    }
  }
}
