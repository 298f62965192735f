package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Term
import graft.riot.RdfPatch
import graft.riot.RdfPatch._

/**
 * RDF-Patch text format, gated on the reference's vendored syntax file
 * (jena-rdfpatch/testing/files/syntax-1.rdfp) and on write→read
 * round-trips over the same op mixes its AbstractTestPatchIO exercises
 * (quads, bnodes, typed literals, RDF 1.2 triple terms, prefix ops,
 * transaction boundaries).
 */
class RdfPatchSpec extends AnyFunSuite {

  test("reference syntax-1.rdfp parses to the expected op sequence") {
    val text = new String(Files.readAllBytes(Paths.get(
      "/root/reference/jena-rdfpatch/testing/files/syntax-1.rdfp")), "UTF-8")
    val ops = RdfPatch.read(text)
    assert(ops.head == Header("id", Term.iri("uuid:bbe2edae-325e-11ec-abcc-a70bbba0dfb1")))
    assert(ops(1) == TxnBegin)
    assert(ops(2) == PrefixAdd("ex", "http://example", None))
    assert(ops(3) == PrefixDelete("ex", None))
    assert(ops(4) == PrefixAdd("", "http://example", None))
    assert(ops(5) == PrefixDelete("", None))
    assert(ops(6) == Add(Term.iri("http://example/s"), Term.iri("http://example/p"),
      Term.iri("http://example/o1"), Some(Term.iri("http://example/g"))))
    assert(ops(7).isInstanceOf[Delete])
    assert(ops.last == TxnCommit)
  }

  test("write-read round trip: quads, bnodes, literals, triple terms") {
    val s2 = Term.bnode("s2")
    val o2 = Term.lit("123", Term.XSD_INTEGER)
    val ops: Seq[Op] = Seq(
      Header("id", Term.iri("uuid:1")),
      TxnBegin,
      PrefixAdd("ex", "http://example/", Some(Term.iri("http://example/g1"))),
      Add(Term.iri("http://example/s1"), Term.iri("http://example/p1"),
        Term.iri("http://example/o1"), Some(Term.iri("http://example/g1"))),
      Add(s2, Term.iri("http://example/p2"), o2, Some(Term.bnode("g2"))),
      // the reference's "dubious" cases: U+FFFD in a literal
      Add(Term.iri("http://example/s3"), Term.iri("http://example/p3"),
        Term.string("abc�def"), None),
      Delete(Term.iri("http://example/s1"), Term.iri("http://example/p1"),
        Term.iri("http://example/o1"), None),
      PrefixDelete("ex", None),
      TxnCommit)
    assert(RdfPatch.read(RdfPatch.write(ops)) == ops)
  }

  test("triple terms round-trip through patch text") {
    val inner = "<<( _:b <http://example/y> \"123\"^^<" + Term.XSD_INTEGER + "> )>>"
    val ops: Seq[Op] = Seq(
      TxnBegin,
      Add(Term(Term.KIND_TRIPLE_TERM, inner, "", ""),
        Term.iri("http://example/p"), Term.iri("http://example/o"), None),
      TxnCommit)
    assert(RdfPatch.read(RdfPatch.write(ops)) == ops)
  }

  test("bad ops are rejected") {
    intercept[IllegalArgumentException](RdfPatch.read("Q <a> <b> <c> ."))
    intercept[IllegalArgumentException](RdfPatch.read("PA <notaliteral> <http://x> ."))
    intercept[IllegalArgumentException](RdfPatch.read("A <a> <b> ."))
  }

  test("change rows feed the snapshot fold") {
    val spark = TestSpark.spark
    val text =
      """TX .
        |A <urn:s1> <urn:p> <urn:o1> .
        |A <urn:s2> <urn:p> "x" .
        |D <urn:s1> <urn:p> <urn:o1> .
        |TC .
        |""".stripMargin
    val rows = RdfPatch.toChangeRows(spark, text)
    assert(rows.count() == 3)
    assert(rows.where(org.apache.spark.sql.functions.col("op") === "A").count() == 2)
    // seq carries the patch's own op order (the fold's tie-breaker)
    val ops = rows.orderBy("seq").collect().map(_.getAs[String]("op")).toSeq
    assert(ops == Seq("A", "A", "D"))
  }
}
