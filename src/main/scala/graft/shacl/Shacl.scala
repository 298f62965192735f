package graft.shacl

import graft.model.{Term, Triple}

/**
 * SHACL core — shapes model + parser (reference: jena-shacl, parser at
 * jena-shacl/src/main/java/org/apache/jena/shacl/parser/ShapesParser.java,
 * constraint classes under .../engine/constraint/). Implemented from the
 * public W3C SHACL REC; gated on the reference's copy of the W3C core
 * test suite (jena-shacl/src/test/files/std/core, 98 sht:Validate cases).
 *
 * The shapes graph is DRIVER-SIDED by design: shapes are small metadata
 * (like a schema), parsed once and broadcast; it is the DATA graph that
 * scales. `Validator` is the complete pure engine (per-graph, usable in
 * mapPartitions over millions of document KGs); `DfShacl` compiles the
 * flat high-volume constraint subset onto DataFrames for single-huge-KG
 * validation.
 */
object SH {
  val NS = "http://www.w3.org/ns/shacl#"
  val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
  val XSD = "http://www.w3.org/2001/XMLSchema#"

  def sh(l: String): Term = Term.iri(NS + l)
  val rdfType: Term = Term.iri(RDF + "type")
  val rdfFirst: Term = Term.iri(RDF + "first")
  val rdfRest: Term = Term.iri(RDF + "rest")
  val rdfNil: Term = Term.iri(RDF + "nil")
  val subClassOf: Term = Term.iri(RDFS + "subClassOf")
  val Violation: Term = sh("Violation")
}

/** Indexed in-memory graph — the per-document twin of the reference's
 * GraphMemFactory graphs used by its validator. */
final class GraphIndex(val triples: Vector[Triple]) {
  val bySubj: Map[Term, Vector[Triple]] = triples.groupBy(_.s)
  val byPred: Map[Term, Vector[Triple]] = triples.groupBy(_.p)
  private val bySP: Map[(Term, Term), Vector[Term]] =
    triples.groupBy(t => (t.s, t.p)).map { case (k, ts) => k -> ts.map(_.o) }
  private val byPO: Map[(Term, Term), Vector[Term]] =
    triples.groupBy(t => (t.p, t.o)).map { case (k, ts) => k -> ts.map(_.s) }

  def objs(s: Term, p: Term): Vector[Term] = bySP.getOrElse((s, p), Vector.empty)
  def subjs(p: Term, o: Term): Vector[Term] = byPO.getOrElse((p, o), Vector.empty)
  def obj(s: Term, p: Term): Option[Term] = objs(s, p).headOption
  def preds(s: Term): Seq[Term] = bySubj.getOrElse(s, Vector.empty).map(_.p).distinct

  /** rdf:first/rest chain. */
  def list(head: Term): Seq[Term] = {
    val out = Vector.newBuilder[Term]
    var cur = head
    var guard = 0
    while (cur != SH.rdfNil && guard < 100000) {
      guard += 1
      obj(cur, SH.rdfFirst).foreach(out += _)
      cur = obj(cur, SH.rdfRest).getOrElse(SH.rdfNil)
    }
    out.result()
  }

  /** SHACL instance check: node has rdf:type T with T rdfs:subClassOf* C. */
  def isInstanceOf(node: Term, cls: Term): Boolean =
    objs(node, SH.rdfType).exists(t => subClassClosure(t).contains(cls))

  def instancesOf(cls: Term): Seq[Term] = {
    val classes = subClassesOf(cls)
    classes.flatMap(c => subjs(SH.rdfType, c)).distinct
  }

  /** All superclasses of t (incl. t) via rdfs:subClassOf*. */
  def subClassClosure(t: Term): Set[Term] = {
    var seen = Set(t)
    var frontier = List(t)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(c => objs(c, SH.subClassOf)).filterNot(seen)
      seen ++= next
      frontier = next
    }
    seen
  }

  /** All subclasses of c (incl. c). */
  private def subClassesOf(c: Term): Seq[Term] = {
    var seen = Set(c)
    var frontier = List(c)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(x => subjs(SH.subClassOf, x)).filterNot(seen)
      seen ++= next
      frontier = next
    }
    seen.toSeq
  }
}

/** SHACL property paths (sh:path structures — reference:
 * jena-shacl/.../parser/ShaclPaths.java). The value-node evaluation is a
 * BAG for sequences/inverse/alternative (duplicate routes count toward
 * cardinality, per the suite's path-sequence-duplicate-001) and a SET for
 * the *-closure operators. */
sealed trait SPath {
  def eval(g: GraphIndex, from: Term): Vector[Term] = this match {
    case PPred(p) => g.objs(from, p)
    case PInv(x) => x match {
      case PPred(p) => g.subjs(p, from)
      case other => other.invEval(g, from)
    }
    case PSeq(xs) => xs.foldLeft(Vector(from))((ns, p) => ns.flatMap(p.eval(g, _)))
    case PAlt(xs) => xs.flatMap(_.eval(g, from)).toVector
    case PZeroOrOne(x) => (from +: x.eval(g, from)).distinct
    case PZeroOrMore(x) => closure(g, from, x, includeSelf = true)
    case POneOrMore(x) =>
      x.eval(g, from).distinct
        .flatMap(n => closure(g, n, x, includeSelf = true)).distinct
  }

  private def invEval(g: GraphIndex, from: Term): Vector[Term] = this match {
    case PPred(p) => g.subjs(p, from)
    case PInv(x) => x.eval(g, from)
    case PSeq(xs) => PSeq(xs.reverse.map(PInv(_))).eval(g, from)
    case PAlt(xs) => xs.flatMap(x => PInv(x).eval(g, from)).toVector
    case PZeroOrOne(x) => PZeroOrOne(PInv(x)).eval(g, from)
    case PZeroOrMore(x) => PZeroOrMore(PInv(x)).eval(g, from)
    case POneOrMore(x) => POneOrMore(PInv(x)).eval(g, from)
  }

  private def closure(g: GraphIndex, from: Term, step: SPath,
      includeSelf: Boolean): Vector[Term] = {
    var seen = Set(from)
    var frontier = Vector(from)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(step.eval(g, _)).distinct.filterNot(seen)
      seen ++= next
      frontier = next
    }
    seen.toVector
  }
}
final case class PPred(p: Term) extends SPath
final case class PInv(x: SPath) extends SPath
final case class PSeq(xs: Seq[SPath]) extends SPath
final case class PAlt(xs: Seq[SPath]) extends SPath
final case class PZeroOrMore(x: SPath) extends SPath
final case class POneOrMore(x: SPath) extends SPath
final case class PZeroOrOne(x: SPath) extends SPath

object SPath {
  /** Parse an sh:path RDF structure. Also returns the structure triples
   * (for re-emitting sh:resultPath in reports). */
  /** A list structure wins over operator keywords on the same node (the
   * suite's path-strange-001/002 pin this precedence, matching the
   * reference's parser). */
  def parse(g: GraphIndex, node: Term): SPath =
    if (node.isIri) PPred(node)
    else if (g.obj(node, SH.rdfFirst).isDefined) PSeq(g.list(node).map(parse(g, _)))
    else {
      def p(pred: String): Option[Term] = g.obj(node, SH.sh(pred))
      p("inversePath").map(n => PInv(parse(g, n)): SPath)
        .orElse(p("alternativePath").map(n => PAlt(g.list(n).map(parse(g, _)))))
        .orElse(p("zeroOrMorePath").map(n => PZeroOrMore(parse(g, n))))
        .orElse(p("oneOrMorePath").map(n => POneOrMore(parse(g, n))))
        .orElse(p("zeroOrOnePath").map(n => PZeroOrOne(parse(g, n))))
        .getOrElse(
          throw new IllegalArgumentException(s"unparseable sh:path node: $node"))
    }

  /** Canonical RDF serialization of a parsed path — the reference's
   * copyPath analog: re-emit only the structure the path MEANS (stray
   * extra triples on the source nodes are dropped), with fresh bnodes per
   * emission so shared source nodes duplicate. Returns (root, triples). */
  def toTriples(p: SPath, fresh: () => Term): (Term, Seq[Triple]) = {
    val out = Vector.newBuilder[Triple]
    def listOf(items: Seq[Term]): Term =
      items.foldRight(SH.rdfNil) { (item, rest) =>
        val cell = fresh()
        out += Triple(cell, SH.rdfFirst, item)
        out += Triple(cell, SH.rdfRest, rest)
        cell
      }
    def emit(p: SPath): Term = p match {
      case PPred(t) => t
      case PSeq(xs) => listOf(xs.map(emit))
      case PInv(x) =>
        val n = fresh(); out += Triple(n, SH.sh("inversePath"), emit(x)); n
      case PAlt(xs) =>
        val n = fresh()
        out += Triple(n, SH.sh("alternativePath"), listOf(xs.map(emit))); n
      case PZeroOrMore(x) =>
        val n = fresh(); out += Triple(n, SH.sh("zeroOrMorePath"), emit(x)); n
      case POneOrMore(x) =>
        val n = fresh(); out += Triple(n, SH.sh("oneOrMorePath"), emit(x)); n
      case PZeroOrOne(x) =>
        val n = fresh(); out += Triple(n, SH.sh("zeroOrOnePath"), emit(x)); n
    }
    val root = emit(p)
    (root, out.result())
  }
}
