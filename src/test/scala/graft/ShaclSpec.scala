package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Iso, Term, Triple}
import graft.riot.TurtleLite
import graft.shacl.{DfShacl, GraphIndex, SH, ShaclSparql, Validator}

/** SHACL core gated on the reference's copy of the W3C SHACL test suite
 * (jena-shacl/src/test/files/std/core — 98 sht:Validate cases). The
 * comparison mirrors the reference's VR.strip + isomorphism check
 * (jena-shacl/.../validation/VR.java:147): reports reduce to {conforms,
 * result, focusNode, resultSeverity, sourceConstraintComponent, value,
 * resultPath(+structure)} — sourceShape and messages excluded — then
 * compare bnode-isomorphically. */
class ShaclSpec extends AnyFunSuite {

  private val ROOT = "/root/reference/jena-shacl/src/test/files/std"
  private val MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  private val SHT = "http://www.w3.org/ns/shacl-test#"

  private def fileIri(path: String): String = "file://" + path
  private def pathOf(iri: String): String = iri.stripPrefix("file://")

  private def parseFile(path: String): Seq[Triple] =
    TurtleLite.parse(Files.readString(Paths.get(path)), fileIri(path))

  /** Keep only the report triples the reference's VR.strip keeps. */
  private def strip(ts: Seq[Triple], root: Term): Seq[Triple] = {
    val g = new GraphIndex(ts.toVector)
    val out = mutable.Buffer[Triple]()
    out += Triple(root, SH.rdfType, SH.sh("ValidationReport"))
    g.objs(root, SH.sh("conforms")).foreach(c =>
      out += Triple(root, SH.sh("conforms"), c))
    g.objs(root, SH.sh("result")).foreach { e =>
      out += Triple(root, SH.sh("result"), e)
      Seq("focusNode", "resultSeverity", "sourceConstraintComponent", "value")
        .foreach(p => g.objs(e, SH.sh(p)).foreach(o =>
          out += Triple(e, SH.sh(p), o)))
      g.objs(e, SH.sh("resultPath")).foreach { pn =>
        out += Triple(e, SH.sh("resultPath"), pn)
        var seen = Set[Term]()
        def walk(n: Term): Unit = if (n.isBNode && !seen.contains(n)) {
          seen += n
          g.bySubj.getOrElse(n, Vector.empty).foreach { t =>
            out += t; walk(t.o)
          }
        }
        walk(pn)
      }
    }
    out.toSeq
  }

  private final case class Case(name: String, dataPath: String,
      shapesPath: String, expectedFile: String, resultNode: Term,
      expectFailure: Boolean)

  /** Walk mf:include chains from the root manifest, collecting
   * sht:Validate entries. */
  private def collectCases(path: String, acc: mutable.Buffer[Case]): Unit = {
    val ts = parseFile(path)
    val g = new GraphIndex(ts.toVector)
    g.subjs(SH.rdfType, Term.iri(MF + "Manifest")).foreach { m =>
      g.objs(m, Term.iri(MF + "include")).foreach(inc =>
        collectCases(pathOf(inc.lex), acc))
    }
    g.subjs(SH.rdfType, Term.iri(SHT + "Validate")).foreach { entry =>
      val action = g.obj(entry, Term.iri(MF + "action")).get
      val dataIri = g.obj(action, Term.iri(SHT + "dataGraph")).get.lex
      val shapesIri = g.obj(action, Term.iri(SHT + "shapesGraph")).get.lex
      val result = g.obj(entry, Term.iri(MF + "result")).get
      acc += Case(entry.lex.split('/').takeRight(2).mkString("/"),
        pathOf(dataIri), pathOf(shapesIri), path, result,
        expectFailure = result == Term.iri(SHT + "Failure"))
    }
  }

  test("W3C SHACL suite (std/core + std/sparql, via VR-strip isomorphism)") {
    val cases = mutable.Buffer[Case]()
    collectCases(s"$ROOT/manifest.ttl", cases)
    assert(cases.size >= 110, s"manifest walk found only ${cases.size} cases")
    val failures = mutable.Buffer[String]()
    cases.foreach { c =>
      try {
        val shapes = parseFile(c.shapesPath)
        val data =
          if (c.dataPath == c.shapesPath) shapes else parseFile(c.dataPath)
        if (c.expectFailure) {
          // sht:Failure: validation itself must abort (pre-binding
          // restriction violations, SHACL spec par.B)
          val r = try {
            ShaclSparql.validate(TestSpark.spark, shapes, data); None
          } catch { case e: Exception => Some(e) }
          if (r.isEmpty) failures += s"${c.name}: expected sht:Failure"
        } else {
          val expectedAll = parseFile(c.expectedFile)
          val report = ShaclSparql.validate(TestSpark.spark, shapes, data)
          val got = strip(Validator.reportTriples(report, shapes),
            Term.bnode("vr1"))
          val want = strip(expectedAll, c.resultNode)
          if (!Iso.isomorphic(got, want))
            failures += s"${c.name}:\n  got:\n${got.map("    " + _.toNTriples).sorted.mkString("\n")}\n  want:\n${want.map("    " + _.toNTriples).sorted.mkString("\n")}"
        }
      } catch {
        case e: Exception => failures += s"${c.name}: EXCEPTION ${e.getMessage}"
      }
    }
    if (failures.nonEmpty)
      Files.writeString(Paths.get("/tmp/shacl_failures.txt"),
        failures.mkString("\n\n"))
    assert(failures.isEmpty,
      s"${failures.size}/${cases.size} SHACL cases failing " +
        s"(details: /tmp/shacl_failures.txt):\n" +
        failures.map(_.linesIterator.next()).mkString("\n"))
    info(s"${cases.size} SHACL cases green (core + SPARQL constraints)")
  }

  /** DfShacl (DataFrame compilation) vs Validator (pure engine) on a
   * seeded random graph covering every flat component — the semantic
   * cross-check for the columnar face. */
  test("DfShacl matches Validator on the flat subset") {
    val spark = TestSpark.spark
    import spark.implicits._
    import SH.sh

    val NS = "urn:t:"
    def iri(l: String) = Term.iri(NS + l)
    def xsd(l: String, dt: String) = Term.lit(l, SH.XSD + dt)
    val rnd = new scala.util.Random(42)

    // data: 200 people with assorted (sometimes missing/dirty) properties
    val data = mutable.Set[Triple]()
    (0 until 200).foreach { i =>
      val p = iri(s"p$i")
      data += Triple(p, SH.rdfType, iri("Person"))
      if (i % 7 != 0) data += Triple(p, iri("age"),
        if (i % 13 == 0) Term.string("old") // wrong datatype
        else xsd((rnd.nextInt(140) - 10).toString, "integer"))
      if (i % 5 == 0) data += Triple(p, iri("age"), xsd((i % 90).toString, "integer"))
      val nick = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      data += Triple(p, iri("nick"), Term.string(nick))
      if (i % 3 == 0) data += Triple(p, iri("knows"),
        if (i % 9 == 0) Term.bnode(s"b$i") else iri(s"p${rnd.nextInt(200)}"))
      if (i % 4 == 0) data += Triple(p, iri("status"),
        Term.string(Seq("active", "idle", "banned", "ghost")(rnd.nextInt(4))))
      // a small class hierarchy exercised via rdfs:subClassOf in DATA
      if (i % 11 == 0) data += Triple(iri(s"p$i"), SH.rdfType, iri("Admin"))
    }
    data += Triple(iri("Admin"), SH.subClassOf, iri("Person"))

    // pair-constraint fixture: lo/hi/lo2 numerics (sometimes missing,
    // sometimes non-numeric) + language-tagged labels
    (0 until 40).foreach { i =>
      val n = iri(s"x$i")
      data += Triple(n, iri("lo"), xsd((i % 7).toString, "integer"))
      if (i % 2 == 0) data += Triple(n, iri("hi"), xsd((i % 5).toString, "integer"))
      if (i % 4 == 0) data += Triple(n, iri("hi"), Term.string("oops"))
      data += Triple(n, iri("lo2"),
        xsd((if (i % 3 == 0) i % 7 else (i + 1) % 7).toString, "integer"))
    }
    (0 until 30).foreach { i =>
      val n = iri(s"l$i")
      data += Triple(n, iri("label"),
        Term.langLit(s"name$i", if (i % 3 == 0) "en" else "en-GB"))
      if (i % 2 == 0) data += Triple(n, iri("label"), Term.langLit(s"other$i", "EN-gb"))
      if (i % 5 == 0) data += Triple(n, iri("label"), Term.langLit(s"de$i", "de"))
      if (i % 7 == 0) data += Triple(n, iri("label"), Term.string("plain"))
    }

    val ps = (1 to 8).map(i => iri(s"PS$i"))
    def list(label: String, items: Seq[Term]): (Term, Seq[Triple]) = {
      val cells = items.indices.map(i => Term.bnode(s"$label$i"))
      (cells.head, items.zipWithIndex.flatMap { case (it, i) =>
        Seq(Triple(cells(i), SH.rdfFirst, it), Triple(cells(i), SH.rdfRest,
          if (i == items.size - 1) SH.rdfNil else cells(i + 1)))
      })
    }
    val (inHead, inTs) = list("st", Seq("active", "idle", "banned").map(Term.string))
    val (inLangHead, inLangTs) = list("lang", Seq(Term.string("en")))
    val shape = iri("PersonShape")
    val shapes = Seq(
      Triple(shape, SH.rdfType, sh("NodeShape")),
      Triple(shape, sh("targetClass"), iri("Person")),
      Triple(shape, sh("property"), ps(0)),
      Triple(ps(0), sh("path"), iri("age")),
      Triple(ps(0), sh("datatype"), Term.iri(SH.XSD + "integer")),
      Triple(ps(0), sh("minInclusive"), xsd("0", "integer")),
      Triple(ps(0), sh("maxExclusive"), xsd("120", "integer")),
      Triple(ps(0), sh("minCount"), xsd("1", "integer")),
      Triple(ps(0), sh("maxCount"), xsd("1", "integer")),
      Triple(shape, sh("property"), ps(1)),
      Triple(ps(1), sh("path"), iri("nick")),
      Triple(ps(1), sh("minLength"), xsd("2", "integer")),
      Triple(ps(1), sh("maxLength"), xsd("8", "integer")),
      Triple(ps(1), sh("pattern"), Term.string("^[A-Za-z]")),
      Triple(shape, sh("property"), ps(2)),
      Triple(ps(2), sh("path"), iri("knows")),
      Triple(ps(2), sh("nodeKind"), sh("IRI")),
      Triple(ps(2), sh("class"), iri("Person")),
      Triple(shape, sh("property"), ps(3)),
      Triple(ps(3), sh("path"), iri("status")),
      Triple(ps(3), sh("in"), inHead),
      // inverse path: everyone must be known by someone
      Triple(shape, sh("property"), ps(4)),
      Triple(ps(4), sh("path"), Term.bnode("invp")),
      Triple(Term.bnode("invp"), sh("inversePath"), iri("knows")),
      Triple(ps(4), sh("minCount"), xsd("1", "integer")),
      // hasValue over targetSubjectsOf on a second shape
      Triple(iri("StatusShape"), sh("targetSubjectsOf"), iri("status")),
      Triple(iri("StatusShape"), sh("property"), ps(5)),
      Triple(ps(5), sh("path"), iri("status")),
      Triple(ps(5), sh("hasValue"), Term.string("active")),
      // pair constraints + languageIn/uniqueLang on a third shape
      Triple(iri("PairShape"), sh("targetSubjectsOf"), iri("lo")),
      Triple(iri("PairShape"), sh("property"), ps(6)),
      Triple(ps(6), sh("path"), iri("lo")),
      Triple(ps(6), sh("lessThan"), iri("hi")),
      Triple(ps(6), sh("equals"), iri("lo2")),
      Triple(ps(6), sh("disjoint"), iri("hi")),
      Triple(iri("LabelShape"), sh("targetSubjectsOf"), iri("label")),
      Triple(iri("LabelShape"), sh("property"), ps(7)),
      Triple(ps(7), sh("path"), iri("label")),
      Triple(ps(7), sh("uniqueLang"), Term.lit("true", SH.XSD + "boolean")),
      Triple(ps(7), sh("languageIn"), inLangHead)) ++ inTs ++ inLangTs

    val want: Set[(String, String, String, Option[String])] =
      Validator.validate(shapes, data.toSeq).results.map { r =>
        val pathIri = r.pathNode.map { pn =>
          val sg = new GraphIndex(shapes.toVector)
          sg.obj(pn, sh("inversePath")).getOrElse(pn).lex
        }
        (r.focus.lex, pathIri.getOrElse(null), r.component.lex,
          r.value.map(_.lex))
      }.toSet
    assert(want.size > 50, s"weak fixture: only ${want.size} violations")
    assert(want.map(_._3).size > 3)

    val df = DfShacl.validate(spark.createDataset(data.toSeq).toDF(), shapes)
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)))).toSet
    // DfShacl reports the path PREDICATE for inverse paths (it has no
    // structure node); normalize `want` the same way above.
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    info(s"${got.size} violations agree across both faces")
  }
}
