package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Iso, Term, Triple}
import graft.riot.TurtleLite
import graft.shacl.{GraphIndex, SH, Validator}

/** SHACL core gated on the reference's copy of the W3C SHACL test suite
 * (jena-shacl/src/test/files/std/core — 98 sht:Validate cases). The
 * comparison mirrors the reference's VR.strip + isomorphism check
 * (jena-shacl/.../validation/VR.java:147): reports reduce to {conforms,
 * result, focusNode, resultSeverity, sourceConstraintComponent, value,
 * resultPath(+structure)} — sourceShape and messages excluded — then
 * compare bnode-isomorphically. */
class ShaclSpec extends AnyFunSuite {

  private val ROOT = "/root/reference/jena-shacl/src/test/files/std/core"
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
      shapesPath: String, expectedFile: String, resultNode: Term)

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
        pathOf(dataIri), pathOf(shapesIri), path, result)
    }
  }

  test("W3C SHACL core suite (std/core, via VR-strip isomorphism)") {
    val cases = mutable.Buffer[Case]()
    collectCases(s"$ROOT/manifest.ttl", cases)
    assert(cases.size >= 90, s"manifest walk found only ${cases.size} cases")
    val failures = mutable.Buffer[String]()
    cases.foreach { c =>
      try {
        val expectedAll = parseFile(c.expectedFile)
        val shapes = parseFile(c.shapesPath)
        val data =
          if (c.dataPath == c.shapesPath) shapes else parseFile(c.dataPath)
        val report = Validator.validate(shapes, data)
        val got = strip(Validator.reportTriples(report, shapes),
          Term.bnode("vr1"))
        val want = strip(expectedAll, c.resultNode)
        if (!Iso.isomorphic(got, want))
          failures += s"${c.name}:\n  got:\n${got.map("    " + _.toNTriples).sorted.mkString("\n")}\n  want:\n${want.map("    " + _.toNTriples).sorted.mkString("\n")}"
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
    info(s"${cases.size} SHACL core cases green")
  }
}
