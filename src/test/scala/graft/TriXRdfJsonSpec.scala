package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Iso, Quad, Term, Triple}
import graft.riot.{NQuads, NTriples, RdfJson, TriX}

/** TriX and RDF/JSON gated on the reference's RIOT fixture suites
 * (jena-arq/testing/RIOT/Lang/{TriX,RDF-JSON}): each .trix/.rj parses to
 * the quads/triples of its paired .nq/.nt (bnode-isomorphic, bnode graph
 * names matched by bijection), every bad file raises, and writes
 * round-trip. */
class TriXRdfJsonSpec extends AnyFunSuite {

  private val TRIX = "/root/reference/jena-arq/testing/RIOT/Lang/TriX"
  private val RJ = "/root/reference/jena-arq/testing/RIOT/Lang/RDF-JSON"

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
  private def ls(dir: String, suffix: String): Seq[String] =
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(suffix)).toSeq.sorted

  /** Quad isomorphism: IRI-named graphs by name; bnode-named graphs by
   * bijection (at most a handful per fixture). */
  private def quadIso(a: Seq[Quad], b: Seq[Quad]): Boolean = {
    def tri(qs: Seq[Quad]): Seq[Triple] = qs.map(q => Triple(q.s, q.p, q.o))
    val ag = a.groupBy(_.g); val bg = b.groupBy(_.g)
    val aN = ag.filter(!_._1.isBNode); val bN = bg.filter(!_._1.isBNode)
    if (aN.keySet.map(_.lex) != bN.keySet.map(_.lex)) return false
    if (!aN.forall { case (g, qs) =>
      Iso.isomorphic(tri(qs), tri(bN.find(_._1.lex == g.lex).get._2)) }) return false
    val aB = ag.keys.filter(_.isBNode).toList
    val bB = bg.keys.filter(_.isBNode).toList
    aB.size == bB.size && (aB.isEmpty ||
      aB.permutations.exists(_.zip(bB).forall { case (x, y) =>
        Iso.isomorphic(tri(ag(x)), tri(bg(y))) }))
  }

  test("W3C/HPL TriX suite: every paired .trix matches its .nq") {
    val pairs = ls(TRIX, ".nq").map(nq =>
      (nq.stripSuffix(".nq") + ".trix", nq))
      .filter(p => Files.exists(Paths.get(p._1)))
    assert(pairs.size >= 17, s"found ${pairs.size} pairs")
    pairs.foreach { case (trix, nq) =>
      val got = TriX.parse(read(trix))
      // graphs are sets; plain and xsd:string literals are ONE term in
      // the model, so the .nq expectation may carry duplicates
      val want = NQuads.parseDocument(read(nq)).distinct
      assert(quadIso(got, want), s"$trix:\n got ${got.map(_.toString).sorted}" +
        s"\n want ${want.map(_.toString).sorted}")
      // round-trip through the writer
      assert(quadIso(TriX.parse(TriX.write(got)), want), s"$trix round-trip")
    }
    info(s"${pairs.size} TriX pairs green (incl. RDF 1.2 triple terms, " +
      "qnames, XMLLiteral, bnode graph names)")
  }

  test("TriX bad files raise") {
    // mirror the reference's own registration (TestTriXBad.java:53–66):
    // bad-01..09 + the four star bads; bad-00 and bad-10 exist on disk
    // but the reference does not test them
    val bads = ls(TRIX, ".trix").filter(_.contains("bad"))
      .filterNot(f => f.endsWith("bad-00.trix") || f.endsWith("bad-10.trix"))
    assert(bads.size >= 13, s"found ${bads.size} bad files")
    bads.foreach { f =>
      val r = try { TriX.parse(read(f)); None } catch {
        case e: Exception => Some(e)
      }
      assert(r.isDefined, s"$f should have raised")
    }
    info(s"${bads.size} TriX error cases raise")
  }

  test("RDF/JSON suite: every paired .rj matches its .nt") {
    val pairs = ls(RJ, ".rj").filterNot(_.contains("bad")).map(rj =>
      (rj, rj.stripSuffix(".rj") + ".nt"))
      .filter(p => Files.exists(Paths.get(p._2)))
    assert(pairs.size >= 3, s"found ${pairs.size} pairs")
    pairs.foreach { case (rj, nt) =>
      val got = RdfJson.parse(read(rj))
      val want = NTriples.parseDocument(read(nt))
      assert(Iso.isomorphic(got, want), s"$rj:\n got $got\n want $want")
      assert(Iso.isomorphic(RdfJson.parse(RdfJson.write(got)), want),
        s"$rj round-trip")
    }
    info(s"${pairs.size} RDF/JSON pairs green")
  }

  test("RDF/JSON bad files raise; typed + tagged literals round-trip") {
    ls(RJ, ".rj").filter(_.contains("bad")).foreach { f =>
      intercept[Exception](RdfJson.parse(read(f)))
    }
    val ts = Seq(
      Triple(Term.iri("http://e/s"), Term.iri("http://e/p"),
        Term.lit("5", Term.XSD_INTEGER)),
      Triple(Term.iri("http://e/s"), Term.iri("http://e/p"),
        Term.langLit("hallo", "de")),
      Triple(Term.bnode("x"), Term.iri("http://e/q"), Term.bnode("y")))
    assert(Iso.isomorphic(RdfJson.parse(RdfJson.write(ts)), ts))
  }
}
