package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Quad, Term, Triple}
import graft.riot.BinaryRdf
import graft.riot.BinaryRdf.{ProtobufRdf, ThriftRdf}

/**
 * RDF-Thrift + RDF-Protobuf binary codecs (BinaryRDF.thrift /
 * binary-rdf.proto). No binary golden files exist in the reference —
 * its tests are runtime round-trips too (TestStreamRDFThrift) — so the
 * gates here are: (a) round-trips over every term shape, (b) one
 * byte-exact golden hand-derived from the PUBLIC Thrift compact
 * protocol spec, (c) decode-only paths (value forms, prefix names)
 * fed through the low-level writer.
 */
class BinaryRdfSpec extends AnyFunSuite {

  private def iri(s: String) = Term.iri(s)

  private val terms: Seq[Term] = Seq(
    iri("http://example/s"),
    Term.bnode("b0"),
    Term.string("plain"),
    Term.langLit("chat", "en"),
    Term.langLit("chat", "en--ltr"), // dir-lang (RDF 1.2)
    Term.lit("42", Term.XSD_INTEGER),
    Term.lit("3.14", Term.XSD_DECIMAL),
    Term.lit("x\ny\"z", Term.XSD_STRING), // control chars survive binary
    Term(Term.KIND_TRIPLE_TERM,
      "<<( <http://example/a> <http://example/p> \"v\" )>>", "", ""))

  private val triples: Seq[Triple] =
    terms.zipWithIndex.map { case (o, i) =>
      Triple(iri(s"http://example/s$i"), iri("http://example/p"), o) }

  private val quads: Seq[Quad] = Seq(
    Quad(iri("http://example/s"), iri("http://example/p"), Term.string("dflt"),
      Term.defaultGraph),
    Quad(iri("http://example/s"), iri("http://example/p"), Term.string("named"),
      iri("http://example/g")),
    Quad(Term.bnode("g"), iri("http://example/p"), Term.lit("1", Term.XSD_INTEGER),
      Term.bnode("gn"))) // bnode graph names are legal

  test("RDF-Thrift: triples round-trip every term shape") {
    val bytes = ThriftRdf.toBytes(triples)
    val back = ThriftRdf.readTriples(new java.io.ByteArrayInputStream(bytes)).toSeq
    assert(back == triples)
  }

  test("RDF-Thrift: quads round-trip incl. default graph omission") {
    val bytes = ThriftRdf.quadsToBytes(quads)
    val back = ThriftRdf.readQuads(new java.io.ByteArrayInputStream(bytes)).toSeq
    assert(back == quads)
  }

  test("RDF-Thrift: byte-exact golden vs the compact protocol spec") {
    // RDF_StreamRow{2: triple{1: term{1: iri{"http://a"}}, 2: term{1:
    // iri{"http://b"}}, 3: term{3: literal{1: "x"}}}} hand-assembled from
    // the published compact-protocol rules (short-form field header =
    // delta<<4 | type; type 12 = struct, 8 = binary; varint lengths;
    // 0x00 struct stop).
    def s(str: String): Seq[Int] = str.getBytes("UTF-8").map(_.toInt & 0xff).toSeq
    val expected: Seq[Int] =
      Seq(0x2c, 0x1c, 0x1c, 0x18, 0x08) ++ s("http://a") ++ Seq(0x00, 0x00) ++
        Seq(0x1c, 0x1c, 0x18, 0x08) ++ s("http://b") ++ Seq(0x00, 0x00) ++
        Seq(0x1c, 0x3c, 0x18, 0x01) ++ s("x") ++ Seq(0x00, 0x00, 0x00, 0x00)
    val got = ThriftRdf.toBytes(Seq(Triple(
      iri("http://a"), iri("http://b"), Term.string("x"))))
      .map(_.toInt & 0xff).toSeq
    assert(got == expected)
  }

  test("RDF-Thrift: value forms and prefix names decode (read-side compat)") {
    // hand-write a stream a value-encoding Jena writer could produce:
    // prefixDecl ex: -> http://ex/ ; then a triple
    //   (ex:s, ex:p, valInteger 7), then one with valDecimal 12.5 and
    //   valDouble.
    val bos = new ByteArrayOutputStream()
    val w = new BinaryRdf.CompactWriter(bos)
    // row 1: prefixDecl
    w.beginStruct(); w.beginStructField(1)
    w.writeString(1, "ex"); w.writeString(2, "http://ex/")
    w.endStruct(); w.endStruct()
    // row 2: triple with prefixName S/P and value-form objects
    def prefixTerm(local: String): Unit = {
      w.beginStructField(4); w.writeString(1, "ex"); w.writeString(2, local)
      w.endStruct(); w.endStruct() // close prefixName + RDF_Term
    }
    w.beginStruct(); w.beginStructField(2) // triple
    w.beginStructField(1); prefixTerm("s")
    w.beginStructField(2); prefixTerm("p")
    w.beginStructField(3); w.writeI64(10, 7L); w.endStruct() // valInteger
    w.endStruct(); w.endStruct()
    // row 3: valDecimal object 12.5 = (125, scale 1)
    w.beginStruct(); w.beginStructField(2)
    w.beginStructField(1); prefixTerm("s")
    w.beginStructField(2); prefixTerm("p")
    w.beginStructField(3)
    w.beginStructField(12); w.writeI64(1, 125L); w.writeI32(2, 1); w.endStruct()
    w.endStruct()
    w.endStruct(); w.endStruct()
    // row 4: valDouble 2.5
    w.beginStruct(); w.beginStructField(2)
    w.beginStructField(1); prefixTerm("s")
    w.beginStructField(2); prefixTerm("p")
    w.beginStructField(3); w.writeDouble(11, 2.5); w.endStruct()
    w.endStruct(); w.endStruct()

    val back = ThriftRdf.readTriples(
      new java.io.ByteArrayInputStream(bos.toByteArray)).toSeq
    assert(back == Seq(
      Triple(iri("http://ex/s"), iri("http://ex/p"), Term.lit("7", Term.XSD_INTEGER)),
      Triple(iri("http://ex/s"), iri("http://ex/p"), Term.lit("12.5", Term.XSD_DECIMAL)),
      Triple(iri("http://ex/s"), iri("http://ex/p"), Term.lit("2.5", Term.XSD_DOUBLE))))
  }

  test("RDF-Protobuf: triples round-trip every term shape") {
    val bytes = ProtobufRdf.toBytes(triples)
    assert(ProtobufRdf.readTriples(bytes).toSeq == triples)
  }

  test("RDF-Protobuf: quads round-trip incl. default graph omission") {
    val bytes = ProtobufRdf.quadsToBytes(quads)
    assert(ProtobufRdf.readQuads(bytes).toSeq == quads)
  }

  test("RDF-Protobuf: byte-exact golden vs the proto3 wire spec") {
    // RDF_StreamRow{triple=2{S=1{iri=1{iri="a"}}, P=2{iri=1{iri="b"}},
    // O=3{literal=3{lex="x", simple=true}}}}, varint-delimited.
    // tags: field<<3|wire; strings wire 2; bool wire 0 (field 9 → 0x48).
    val expected: Seq[Int] = Seq(
      25,              // row length
      0x12, 23,        // row.triple (field 2, len 23)
      0x0a, 5, 0x0a, 3, 0x0a, 1, 'a'.toInt, // S: term.iri{iri="a"}
      0x12, 5, 0x0a, 3, 0x0a, 1, 'b'.toInt, // P
      0x1a, 7, 0x1a, 5, 0x0a, 1, 'x'.toInt, 0x48, 1) // O: literal simple
    val got = ProtobufRdf.toBytes(Seq(Triple(iri("a"), iri("b"), Term.string("x"))))
      .map(_.toInt & 0xff).toSeq
    assert(got == expected)
  }

  test("RDF-Protobuf: truncated messages fail loudly, never desync") {
    val whole = ProtobufRdf.toBytes(
      Seq(Triple(iri("a"), iri("b"), Term.string("x"))))
    // every strict prefix must raise the codec's own error — not an
    // ArrayIndexOutOfBounds, and never silently decode garbage
    (1 until whole.length).foreach { n =>
      val cut = whole.take(n)
      intercept[IllegalArgumentException] {
        ProtobufRdf.readTriples(cut).toList
      }
    }
  }

  test("binary result sets: vars + rows with UNDEF cells round-trip (both formats)") {
    val vars = Seq("x", "y")
    val rows: Seq[Seq[Option[Term]]] = Seq(
      Seq(Some(iri("http://example/a")), Some(Term.langLit("hi", "en"))),
      Seq(None, Some(Term.lit("4", Term.XSD_INTEGER))),
      Seq(Some(Term.bnode("r2")), None))
    val tb = new ByteArrayOutputStream()
    ThriftRdf.writeResultSet(vars, rows.iterator, tb)
    assert(ThriftRdf.readResultSet(
      new java.io.ByteArrayInputStream(tb.toByteArray)) == ((vars, rows)))
    val pb = new ByteArrayOutputStream()
    ProtobufRdf.writeResultSet(vars, rows.iterator, pb)
    assert(ProtobufRdf.readResultSet(pb.toByteArray) == ((vars, rows)))
  }

  test("Spark faces: distributed write + read round-trip both formats") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ds = spark.createDataset(triples).repartition(3)
    val d1 = java.nio.file.Files.createTempDirectory("trdf").toString
    BinaryRdf.writeThrift(ds, d1)
    assert(BinaryRdf.readThrift(spark, d1 + "/*").collect().toSet == triples.toSet)
    val d2 = java.nio.file.Files.createTempDirectory("pbrdf").toString
    BinaryRdf.writeProtobuf(ds, d2)
    assert(BinaryRdf.readProtobuf(spark, d2 + "/*").collect().toSet == triples.toSet)
  }
}
