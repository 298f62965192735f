package graft

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable.ListBuffer
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Term
import graft.riot.TurtleLite
import graft.shex._
import graft.shex.ShexAst._

/**
 * ShEx gate over the reference's vendored shexTest spec suite
 * (jena-shex/src/test/files/spec): the full ShExC syntax suite (each file
 * must parse), the negativeSyntax suite (each must be rejected), and the
 * validation manifest (~1,100 focus/shape conformance cases). Exclusions
 * mirror the reference's own (jena-shex runner/ShexTests.java): EXTERNAL
 * shapes, external semantic actions, and the blank-node-LABEL tests that
 * assume labels survive parsing (RDF forbids that; our reader scopes
 * labels like the reference's).
 */
class ShexSpec extends AnyFunSuite {

  private val SPEC = "/root/reference/jena-shex/src/test/files/spec"
  private val MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  private val SHT = "http://www.w3.org/ns/shacl/test-suite#"
  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  // ---------------- syntax suites ----------------
  private def shexFiles(dir: String): Seq[Path] =
    Files.list(Paths.get(s"$SPEC/$dir")).iterator.asScala
      .filter(_.toString.endsWith(".shex")).toSeq.sortBy(_.toString)

  test("shexTest syntax: every schema parses") {
    // the two exclusions carry ill-formed surrogate pairs — same skips as
    // the reference (RunnerShexSyntax.excludes)
    val skip = Set("1refbnode_with_spanning_PN_CHARS_BASE1.shex", "_all.shex")
    val failures = ListBuffer[String]()
    var n = 0
    shexFiles("syntax").filterNot(p => skip.contains(p.getFileName.toString)).foreach { p =>
      n += 1
      try ShexParser.parseFile(p.toString)
      catch { case e: RuntimeException =>
        failures += s"${p.getFileName}: ${e.getMessage}" }
    }
    assert(failures.isEmpty, s"${failures.size}/$n failed:\n  " + failures.take(40).mkString("\n  "))
    assert(n > 400)
  }

  test("shexTest negativeSyntax: every schema is rejected") {
    val failures = ListBuffer[String]()
    var n = 0
    shexFiles("negativeSyntax").foreach { p =>
      n += 1
      try {
        ShexParser.parseFile(p.toString)
        failures += p.getFileName.toString
      } catch { case _: RuntimeException => () }
    }
    assert(failures.isEmpty,
      s"${failures.size}/$n parsed but must fail:\n  " + failures.mkString("\n  "))
    assert(n > 90)
  }

  // ---------------- validation manifest ----------------
  private case class VCase(name: String, positive: Boolean, traits: Set[String],
                           schema: String, shape: Option[String],
                           data: Option[String], focus: Option[Term],
                           map: Option[String], extensionPrints: List[String])

  private def loadManifest(): Seq[VCase] = {
    val dir = s"$SPEC/validation"
    val base = s"file://$dir/"
    val text = new String(Files.readAllBytes(Paths.get(s"$dir/manifest.ttl")), "UTF-8")
    val triples = TurtleLite.parse(text, base)
    val byS = triples.groupBy(_.s)
    def objs(s: Term, p: String): Seq[Term] =
      byS.getOrElse(s, Nil).collect { case t if t.p.lex == p => t.o }
    def obj(s: Term, p: String): Option[Term] = objs(s, p).headOption
    def listItems(head: Term): Seq[Term] = {
      val out = ListBuffer[Term]()
      var cur = head
      while (!(cur.isIri && cur.lex == RDF + "nil")) {
        obj(cur, RDF + "first").foreach(out += _)
        cur = obj(cur, RDF + "rest").getOrElse(Term.iri(RDF + "nil"))
      }
      out.toList
    }
    val root = triples.collect {
      case t if t.p.lex == RDF + "type" && t.o.lex == MF + "Manifest" => t.s
    }.head
    objs(root, MF + "entries").flatMap(listItems).flatMap { e =>
      val types = objs(e, RDF + "type").map(_.lex).toSet
      val positive =
        if (types.contains(SHT + "ValidationTest")) Some(true)
        else if (types.contains(SHT + "ValidationFailure")) Some(false)
        else None
      positive.flatMap { pos =>
        obj(e, MF + "action").map { a =>
          val prints = objs(e, MF + "extensionResults").flatMap(listItems)
            .flatMap(r => obj(r, MF + "prints")).map(_.lex).toList
          VCase(
            name = obj(e, MF + "name").map(_.lex).getOrElse(e.lex),
            positive = pos,
            traits = objs(e, SHT + "trait").map(_.lex.stripPrefix(SHT)).toSet,
            schema = obj(a, SHT + "schema").get.lex.stripPrefix("file://"),
            shape = obj(a, SHT + "shape").map(_.lex),
            data = obj(a, SHT + "data").map(_.lex.stripPrefix("file://")),
            focus = obj(a, SHT + "focus"),
            map = obj(a, SHT + "map").map(_.lex.stripPrefix("file://")),
            extensionPrints = prints)
        }
      }
    }
  }

  /** Name exclusions mirrored from the reference's ShexTests.java: EXTERNAL
   * shapes, one annotation+semact case, and the bnode-LABEL tests. */
  private val nameExcludes: Set[String] = Set(
    "shapeExtern_pass", "shapeExtern_fail", "shapeExternRef_pass",
    "shapeExternRef_fail", "open3Eachdotclosecard23Annot3Code2-p1p2p3X3",
    // bNodeLabeltests() — tests that depend on blank-node LABELS
    "1focusLength-dot_fail-bnode-short", "1focusLength-dot_pass-bnode-equal",
    "1focusLength-dot_fail-bnode-long", "1focusMinLength-dot_pass-bnode-equal",
    "1focusMinLength-dot_pass-bnode-long", "1focusMaxLength-dot_pass-bnode-short",
    "1focusMaxLength-dot_pass-bnode-equal", "1focusPatternB-dot_pass-bnode-match",
    "1focusPatternB-dot_pass-bnode-long", "1focusBNODELength_dot_pass",
    "1bnodeLength_pass-bnode-equal", "1bnodeLength_fail-bnode-short",
    "1bnodeLength_fail-bnode-long", "1bnodeLength_fail-lit-equal",
    "1bnodeLength_fail-iri-equal", "1nonliteralLength_fail-bnode-short",
    "1nonliteralLength_pass-bnode-equal", "1nonliteralLength_fail-bnode-long",
    "1bnodeMinlength_pass-bnode-equal", "1bnodeMinlength_pass-bnode-long",
    "1nonliteralMinlength_pass-bnode-equal", "1nonliteralMinlength_pass-bnode-long",
    "1bnodeMaxlength_pass-bnode-short", "1bnodeMaxlength_pass-bnode-equal",
    "1nonliteralMaxlength_pass-bnode-short", "1nonliteralMaxlength_pass-bnode-equal",
    "1bnodePattern_pass-bnode-match", "1bnodePattern_fail-bnode-short",
    "1bnodePattern_fail-bnode-long", "1bnodeMinlength_fail-bnode-short",
    "1nonliteralPattern_pass-bnode-match", "1nonliteralPattern_pass-bnode-long",
    "1nonliteralMinlength_fail-bnode-short", "1bnodeMaxlength_fail-bnode-long",
    "1nonliteralMaxlength_fail-bnode-long", "1valExprRefbnode-IV1_pass-lit-equal",
    "1focusBNODE_dot_fail-iriFocusLabel-equal", "1focusBNODE_dot_pass",
    "bnode1dot_fail-missing", "bnode1dot_pass-others_lexicallyEarlier")

  private val traitExcludes = Set("ExternalSemanticAction")

  test("shexTest validation manifest") {
    val cases = loadManifest()
    assert(cases.size > 1000, s"only ${cases.size} cases loaded")
    val failures = ListBuffer[String]()
    var ran = 0
    var skipped = 0
    cases.foreach { c =>
      if (nameExcludes.contains(c.name) || c.traits.exists(traitExcludes.contains)) {
        skipped += 1
      } else {
        ran += 1
        try {
          val manifestBase = s"file://$SPEC/validation/"
          val schema = ShexParser.parseFile(c.schema, Some(manifestBase))
          val dataTriples = c.data.map { f =>
            TurtleLite.parse(new String(Files.readAllBytes(Paths.get(f)), "UTF-8"),
              "file://" + f)
          }.getOrElse(Nil)
          val acts = new TestSemActs
          val conforms = c.map match {
            case Some(mapFile) =>
              val entries = readShapeMap(mapFile)
              entries.forall { case (node, shape) =>
                ShexValidator.validate(dataTriples, schema, Term.iri(node),
                  Some(shape), Some(acts)).conforms
              }
            case None =>
              ShexValidator.validate(dataTriples, schema, c.focus.get,
                c.shape.map(_.toString), Some(acts)).conforms
          }
          if (conforms != c.positive)
            failures += s"${c.name}: got conforms=$conforms, want ${c.positive} [${c.traits.mkString(",")}]"
          else if (c.extensionPrints.nonEmpty && acts.out.toList != c.extensionPrints)
            failures += s"${c.name}: prints ${acts.out.toList} != ${c.extensionPrints}"
        } catch {
          case e: RuntimeException =>
            failures += s"${c.name}: EXCEPTION ${e.getClass.getSimpleName}: ${e.getMessage} [${c.traits.mkString(",")}]"
        }
      }
    }
    info(s"ran $ran, skipped $skipped (reference-mirrored exclusions)")
    assert(failures.isEmpty,
      s"${failures.size}/$ran failed:\n  " + failures.take(60).mkString("\n  "))
    assert(ran >= 1000)
  }

  /** shexTest shape-map JSON: `[{"node": "...", "shape": "..."}]`. */
  private def readShapeMap(file: String): Seq[(String, String)] = {
    val text = new String(Files.readAllBytes(Paths.get(file)), "UTF-8")
    val entry = """\{\s*"node"\s*:\s*"([^"]+)"\s*,\s*"shape"\s*:\s*"([^"]+)"\s*\}""".r
    entry.findAllMatchIn(text).map(m => (m.group(1), m.group(2))).toSeq
  }
}
