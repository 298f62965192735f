package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Iso, Quad, Term, Triple}
import graft.riot.{JsonLd, TrigLite, TurtleLite}

/** JSON-LD reader gated on the reference's own fixture pairs
 * (jena-arq/testing/RIOT/jsonld: each .jsonld has a Turtle/TriG twin the
 * reference asserts isomorphism against — TestJsonLDReader-style) plus
 * the jsonld11 docs and per-feature units. */
class JsonLdSpec extends AnyFunSuite {

  private val FIX = "/root/reference/jena-arq/testing/RIOT/jsonld"
  private val FIX11 = "/root/reference/jena-arq/testing/RIOT/jsonld11"
  private val XSD = "http://www.w3.org/2001/XMLSchema#"
  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  private def slurp(p: String): String = Files.readString(Paths.get(p))

  /** Dataset isomorphism for ground graph names: per-graph Iso. */
  private def isoDataset(a: Seq[Quad], b: Seq[Quad]): Boolean = {
    val ga = a.groupBy(_.g.lex)
    val gb = b.groupBy(_.g.lex)
    ga.keySet == gb.keySet && ga.forall { case (g, qs) =>
      Iso.isomorphic(qs.map(_.triple), gb(g).map(_.triple))
    }
  }

  test("fixture graph1.jsonld isomorphic to graph1.ttl") {
    val got = JsonLd.parseTriples(slurp(s"$FIX/graph1.jsonld"))
    val want = TurtleLite.parse(slurp(s"$FIX/graph1.ttl"))
    assert(Iso.isomorphic(got, want),
      s"got:\n${got.map(_.toNTriples).sorted.mkString("\n")}\nwant:\n${want.map(_.toNTriples).sorted.mkString("\n")}")
  }

  test("fixture graph2.jsonld isomorphic to graph2.ttl") {
    val got = JsonLd.parseTriples(slurp(s"$FIX/graph2.jsonld"))
    val want = TurtleLite.parse(slurp(s"$FIX/graph2.ttl"))
    assert(Iso.isomorphic(got, want),
      s"got:\n${got.map(_.toNTriples).sorted.mkString("\n")}\nwant:\n${want.map(_.toNTriples).sorted.mkString("\n")}")
  }

  test("fixture dataset1.jsonld isomorphic to dataset1.trig (named graphs)") {
    val got = JsonLd.parse(slurp(s"$FIX/dataset1.jsonld"))
    val want = TrigLite.parse(slurp(s"$FIX/dataset1.trig"))
    assert(isoDataset(got, want),
      s"got:\n${got.map(_.toNQuads).sorted.mkString("\n")}\nwant:\n${want.map(_.toNQuads).sorted.mkString("\n")}")
  }

  test("jsonld11 doc-1: @version 1.1 + @vocab + integer coercion") {
    val got = JsonLd.parseTriples(slurp(s"$FIX11/doc-1.jsonld11"))
    assert(got == Seq(Triple(
      Term.iri("http://example/s"), Term.iri("http://example/p"),
      Term.lit("123", XSD + "integer"))))
  }

  test("jsonld11 doc-2: @context array, compact-IRI key, plain string object") {
    val got = JsonLd.parseTriples(slurp(s"$FIX11/doc-2.jsonld11"))
    assert(got.size == 1)
    val t = got.head
    assert(t.s.isBNode)
    assert(t.p == Term.iri("http://xmlns.com/foaf/0.1/depication"))
    assert(t.o == Term.string("http://twitter.com/"))
  }

  test("jsonld11 doc-3: scoped @context term + multi-object context array") {
    val got = JsonLd.parseTriples(slurp(s"$FIX11/doc-3.jsonld11"))
    assert(got == Seq(Triple(
      got.head.s, Term.iri("http://xmlns.com/foaf/0.1/depication"),
      Term.string("http://twitter.com/picture"))))
    assert(got.head.s.isBNode)
  }

  test("@list container and explicit @list produce first/rest chains") {
    val doc =
      """{ "@context": { "xs": { "@id": "http://ex/xs", "@container": "@list" } },
        |  "@id": "http://ex/s", "xs": [ "a", "b" ],
        |  "http://ex/empty": { "@list": [] } }""".stripMargin
    val got = JsonLd.parseTriples(doc)
    val firsts = got.filter(_.p.lex == RDF + "first").map(_.o.lex).sorted
    assert(firsts == Seq("a", "b"))
    assert(got.count(_.p.lex == RDF + "rest") == 2)
    assert(got.exists(t => t.p.lex == "http://ex/empty" && t.o == Term.iri(RDF + "nil")))
  }

  test("@reverse term definitions and @reverse maps invert the triple") {
    val doc =
      """{ "@context": { "childOf": { "@reverse": "http://ex/parentOf" } },
        |  "@id": "http://ex/alice",
        |  "childOf": { "@id": "http://ex/bob" },
        |  "@reverse": { "http://ex/knows": { "@id": "http://ex/eve" } } }""".stripMargin
    val got = JsonLd.parseTriples(doc)
    assert(got.contains(Triple(Term.iri("http://ex/bob"),
      Term.iri("http://ex/parentOf"), Term.iri("http://ex/alice"))))
    assert(got.contains(Triple(Term.iri("http://ex/eve"),
      Term.iri("http://ex/knows"), Term.iri("http://ex/alice"))))
  }

  test("default @language, value objects, natives, @base resolution") {
    val doc =
      """{ "@context": { "@language": "en", "@base": "http://base/x/",
        |                "name": "http://ex/name", "n": "http://ex/n" },
        |  "@id": "rel",
        |  "name": "hello",
        |  "n": [ 7, 4.5, true,
        |         { "@value": "chat", "@language": "fr" },
        |         { "@value": "9", "@type": "http://www.w3.org/2001/XMLSchema#byte" } ] }""".stripMargin
    val got = JsonLd.parseTriples(doc)
    val s = Term.iri("http://base/x/rel")
    assert(got.contains(Triple(s, Term.iri("http://ex/name"), Term.langLit("hello", "en"))))
    val objs = got.filter(_.p.lex == "http://ex/n").map(_.o).toSet
    assert(objs == Set(
      Term.lit("7", XSD + "integer"),
      Term.lit("4.5E0", XSD + "double"),
      Term.lit("true", XSD + "boolean"),
      Term.langLit("chat", "fr"),
      Term.lit("9", XSD + "byte")))
  }

  test("anonymous nested @graph gets a blank graph name; remote @context raises") {
    val doc =
      """[ { "@graph": [ { "@id": "http://ex/s", "http://ex/p": "v" } ] } ]""".stripMargin
    val got = JsonLd.parse(doc)
    assert(got.size == 1 && got.head.g.isBNode)
    intercept[IllegalArgumentException] {
      JsonLd.parse("""{ "@context": "http://remote/ctx.jsonld", "@id": "http://s" }""")
    }
  }

  test("writer round-trips datasets through parse (expanded flat form)") {
    val quads = JsonLd.parse(slurp(s"$FIX/dataset1.jsonld")) ++
      JsonLd.parseTriples(slurp(s"$FIX/graph1.jsonld"))
        .map(t => Quad(t.s, t.p, t.o, Term.defaultGraph))
    val back = JsonLd.parse(JsonLd.write(quads))
    assert(isoDataset(back, quads),
      s"got:\n${back.map(_.toNQuads).sorted.mkString("\n")}")
  }

  test("distributed read: whole-file source with per-doc bnode scopes") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("jsonld_read")
    Files.writeString(dir.resolve("a.jsonld"),
      """{ "@id": "http://ex/a", "http://ex/p": { "http://ex/q": "x" } }""")
    Files.writeString(dir.resolve("b.jsonld"),
      """{ "@id": "http://ex/b", "http://ex/p": { "http://ex/q": "y" } }""")
    val got = JsonLd.read(spark, dir.toString).collect().toSeq
    assert(got.size == 4)
    // the two anonymous objects must stay DISTINCT bnodes across files
    assert(got.filter(_.p.lex == "http://ex/p").map(_.o.lex).distinct.size == 2)
  }

  test("@set is transparent: every member emits, in every value position") {
    val doc =
      """{ "@id": "http://ex/s",
        |  "http://ex/p": { "@set": [ "a", "b", "c" ] },
        |  "@reverse": { "http://ex/q": { "@set": [
        |    { "@id": "http://ex/x" }, { "@id": "http://ex/y" } ] } } }""".stripMargin
    val got = JsonLd.parseTriples(doc)
    assert(got.filter(_.p.lex == "http://ex/p").map(_.o.lex).sorted ==
      Seq("a", "b", "c"))
    assert(got.filter(_.p.lex == "http://ex/q").map(_.s.lex).sorted ==
      Seq("http://ex/x", "http://ex/y"))
  }

  test("a single value under a @list container wraps as a one-element list") {
    val doc =
      """{ "@context": { "xs": { "@id": "http://ex/xs", "@container": "@list" } },
        |  "@id": "http://ex/s", "xs": "solo" }""".stripMargin
    val got = JsonLd.parseTriples(doc)
    assert(got.exists(t => t.p.lex == RDF + "first" && t.o.lex == "solo"))
    assert(got.exists(t => t.p.lex == RDF + "rest" && t.o == Term.iri(RDF + "nil")))
    assert(got.exists(t => t.p.lex == "http://ex/xs" && t.o.isBNode))
  }

  test("non-dyadic JSON doubles canonicalize to the shortest lexical form") {
    val got = JsonLd.parseTriples(
      """{ "@id": "http://ex/s", "http://ex/d": 1.1, "http://ex/e": 4.5 }""")
    assert(got.exists(t => t.p.lex == "http://ex/d" &&
      t.o.lex == "1.1E0" && t.o.dt == XSD + "double"))
    assert(got.exists(t => t.p.lex == "http://ex/e" && t.o.lex == "4.5E0"))
  }
}
