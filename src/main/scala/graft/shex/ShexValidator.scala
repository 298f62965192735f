package graft.shex

import scala.collection.mutable

import graft.model.{Term, Triple}
import graft.shacl.Xsd
import graft.shex.ShexAst._

/**
 * ShEx validation semantics (reference: jena-shex eval/ShapeEval*.java and
 * the ShEx 2.1 spec §5.5 "Shapes and Triple Expressions"). Pure per-graph
 * Scala — the Spark faces (`ShexOps`) run this inside mapPartitions over
 * document-sized graphs, exactly like `shacl.Validator`.
 *
 * Semantics implemented:
 *  - Shape: neighbourhood = arcsOut; matchables are the triples whose
 *    predicate a forward TripleConstraint mentions; some partition of the
 *    matchables must satisfy the expression; non-satisfying leftovers are
 *    only allowed on EXTRA predicates; satisfying triples beyond a
 *    constraint's max are never excused by EXTRA; CLOSED forbids
 *    unmentioned outgoing predicates. Inverse constraints evaluate over
 *    arcsIn(pred) wholesale (the reference does the same).
 *  - Recursion: assume-and-verify on (node, shape-label) pairs.
 *  - Node constraints: kind / datatype (with XSD lexical-validity) /
 *    string + numeric facets / value sets with stems, ranges, exclusions.
 */
object ShexValidator {

  /** Semantic-action hook; `None` handlers ignore the action (pass). */
  trait SemActHandler {
    def uris: Set[String]
    def evalStart(act: SemAct): Boolean
    def evalShapeExpr(act: SemAct, focus: Term): Boolean
    def evalTripleExpr(act: SemAct, triples: Seq[Triple]): Boolean
  }

  final case class Report(conforms: Boolean)

  def validate(graph: Seq[Triple], schema: ShexSchema, focus: Term,
               shapeLabel: Option[String],
               semActs: Option[SemActHandler] = None): Report = {
    val ctx = new Ctx(graph, schema.resolved, semActs)
    // start semantic actions run when validation enters via a shape label
    // (the reference's shapeRef entry point dispatches them; the
    // pre-resolved-shape entry point does not — mirrored).
    if (shapeLabel.isDefined && !ctx.runStartActs(schema.startActs))
      return Report(false)
    val expr = shapeLabel match {
      case Some(l) => ctx.schema.shapes.getOrElse(l,
        throw new ShexException(s"unknown shape label: $l"))
      case None => ctx.schema.start.getOrElse(
        throw new ShexException("schema has no start shape"))
    }
    val label = shapeLabel.getOrElse("")
    Report(ctx.satisfiesLabelled(focus, label, expr))
  }

  // ==================================================================
  private final class Ctx(graph: Seq[Triple], val schema: ShexSchema,
                          handler: Option[SemActHandler]) {
    private val bySubj: Map[Term, Seq[Triple]] = graph.groupBy(_.s)
    private val byObjPred: Map[(Term, String), Seq[Triple]] =
      graph.groupBy(t => (t.o, t.p.lex))

    private val inProgress = mutable.Set[(Term, String)]()

    def runStartActs(acts: List[SemAct]): Boolean =
      acts.forall(a => handler match {
        case Some(h) if h.uris.contains(a.iri) => h.evalStart(a)
        case _ => true
      })

    private def runShapeActs(acts: List[SemAct], focus: Term): Boolean =
      acts.forall(a => handler match {
        case Some(h) if h.uris.contains(a.iri) => h.evalShapeExpr(a, focus)
        case _ => true
      })

    private def runTripleActs(acts: List[SemAct], ts: Seq[Triple]): Boolean =
      acts.forall(a => handler match {
        case Some(h) if h.uris.contains(a.iri) => h.evalTripleExpr(a, ts)
        case _ => true
      })

    def satisfiesLabelled(node: Term, label: String, expr: ShapeExpr): Boolean = {
      val key = (node, label)
      if (inProgress.contains(key)) return true // coinductive assumption
      inProgress += key
      try satisfies(node, expr)
      finally inProgress -= key
    }

    def satisfies(node: Term, expr: ShapeExpr): Boolean = expr match {
      case ShapeAnd(es) => es.forall(satisfies(node, _))
      case ShapeOr(es) => es.exists(satisfies(node, _))
      case ShapeNot(e) => !satisfies(node, e)
      case ShapeRef(l) =>
        val e = schema.shapes.getOrElse(l,
          throw new ShexException(s"unknown shape reference: $l"))
        satisfiesLabelled(node, l, e)
      case ShapeExternal => false
      case nc: NodeConstraint => nodeSatisfies(node, nc)
      case sh: Shape => shapeSatisfies(node, sh)
    }

    // ---------------- Shape (triple-expression matching) ----------------
    private def shapeSatisfies(node: Term, sh: Shape): Boolean = {
      val arcsOut = bySubj.getOrElse(node, Nil)
      sh.expr match {
        case None =>
          // `{}` matches any node (no constraints); CLOSED {} demands no
          // outgoing triples at all
          (!sh.closed || arcsOut.isEmpty) && runShapeActs(sh.semActs, node)
        case Some(te) =>
          val fwd = forwardPreds(te)
          val matchables = arcsOut.filter(t => fwd.contains(t.p.lex))
          val ok = matchExpr(node, matchables, te, sh.extra)
          val closedOk = !sh.closed || arcsOut.forall(t => fwd.contains(t.p.lex))
          ok && closedOk && runShapeActs(sh.semActs, node)
      }
    }

    private def forwardPreds(te: TripleExpr): Set[String] = te match {
      case TripleConstraint(inv, p, _, _, _, _) => if (inv) Set.empty else Set(p)
      case EachOf(es, _, _, _) => es.flatMap(forwardPreds).toSet
      case OneOf(es, _, _, _) => es.flatMap(forwardPreds).toSet
      case TripleExprRef(l) => throw new ShexException(s"unresolved include: $l")
    }

    private def matchExpr(node: Term, ts: Seq[Triple], te: TripleExpr,
                          extra: Set[String]): Boolean = te match {
      case tc @ TripleConstraint(_, _, _, _, _, _) =>
        matchTC(node, ts, tc, extra)
      case EachOf(es, 1, 1, acts) =>
        matchEachOnce(node, ts, es, extra) && runTripleActs(acts, ts)
      case OneOf(es, 1, 1, acts) =>
        es.exists(e => matchExpr(node, ts, e, extra)) && runTripleActs(acts, ts)
      case EachOf(es, m, x, acts) =>
        matchGroupCard(node, ts, EachOf(es, 1, 1, Nil), m, x, extra) &&
          runTripleActs(acts, ts)
      case OneOf(es, m, x, acts) =>
        matchGroupCard(node, ts, OneOf(es, 1, 1, Nil), m, x, extra) &&
          runTripleActs(acts, ts)
      case TripleExprRef(l) => throw new ShexException(s"unresolved include: $l")
    }

    /** Triple constraint over its slice of the matchables (reference:
     * ShapeEvalTripleConstraint.matchesCardinalityTC). */
    private def matchTC(node: Term, slice: Seq[Triple], tc: TripleConstraint,
                        extra: Set[String]): Boolean = {
      val triples =
        if (tc.inverse) byObjPred.getOrElse((node, tc.pred), Nil)
        else {
          if (slice.exists(_.p.lex != tc.pred)) return false
          slice
        }
      val (positive, negative) = triples.partition { t =>
        val v = if (tc.inverse) t.s else t.o
        tc.value.forall(satisfies(v, _))
      }
      val n = positive.size
      if (n < tc.min) return false
      // non-satisfying triples are excused only on EXTRA predicates
      if (!extra.contains(tc.pred) && negative.nonEmpty) return false
      if (tc.max >= 0 && n > tc.max) return false
      runTripleActs(tc.semActs, triples)
    }

    /** EachOf single repetition: distribute the slice among the children by
     * predicate; predicates claimed by several children branch. */
    private def matchEachOnce(node: Term, ts: Seq[Triple],
                              es: List[TripleExpr], extra: Set[String]): Boolean = {
      val childPreds: List[Set[String]] = es.map(forwardPreds)
      val claimants: Map[String, List[Int]] =
        childPreds.zipWithIndex
          .flatMap { case (ps, k) => ps.map(_ -> k) }
          .groupBy(_._1).map { case (p, l) => p -> l.map(_._2) }
      // every triple must be placeable
      if (ts.exists(t => !claimants.contains(t.p.lex))) return false

      def assign(rest: List[Triple], acc: Map[Int, List[Triple]]): Boolean =
        rest match {
          case Nil =>
            es.indices.forall(k =>
              matchExpr(node, acc.getOrElse(k, Nil).reverse, es(k), extra))
          case t :: more =>
            claimants(t.p.lex).exists(k =>
              assign(more, acc.updated(k, t :: acc.getOrElse(k, Nil))))
        }
      assign(ts.toList, Map.empty)
    }

    /** Group with cardinality {m, x}: the slice splits into j repetitions
     * each matching `inner` once; j below m is allowed only when `inner`
     * matches the empty bag (so the missing repetitions are vacuous). */
    private def matchGroupCard(node: Term, ts: Seq[Triple], inner: TripleExpr,
                               m: Int, x: Int, extra: Set[String]): Boolean = {
      val maxReps = if (x < 0) math.max(ts.size, 1) else x
      if (ts.isEmpty)
        return m == 0 || matchExpr(node, Nil, inner, extra)
      // split ts into up-to-maxReps non-empty groups, each matching inner;
      // padding to m with empty repetitions must itself be legal
      def emptyOk: Boolean = matchExpr(node, Nil, inner, extra)
      def split(rest: List[Triple], reps: Int): Boolean = {
        if (rest.isEmpty)
          return reps >= m || emptyOk
        if (reps >= maxReps) return false
        // choose the subset of `rest` forming the next repetition; the
        // first remaining triple anchors the subset (canonical enumeration)
        val head = rest.head
        val tail = rest.tail
        subsets(tail).exists { sub =>
          val rep = head :: sub
          val remain = diff(tail, sub)
          matchExpr(node, rep, inner, extra) && split(remain, reps + 1)
        }
      }
      split(ts.toList, 0)
    }

    private def subsets(l: List[Triple]): Iterator[List[Triple]] = {
      val n = l.size
      if (n > 20) throw new ShexException("group-cardinality slice too large")
      Iterator.range(0, 1 << n).map { mask =>
        l.zipWithIndex.collect { case (t, k) if (mask & (1 << k)) != 0 => t }
      }
    }
    private def diff(l: List[Triple], sub: List[Triple]): List[Triple] = {
      val counts = mutable.Map[Triple, Int]().withDefaultValue(0)
      sub.foreach(t => counts(t) += 1)
      l.filter { t => if (counts(t) > 0) { counts(t) -= 1; false } else true }
    }

    // ---------------- node constraints ----------------
    private def nodeSatisfies(node: Term, nc: NodeConstraint): Boolean = {
      val kindOk = nc.kind.forall {
        case IriKind => node.isIri
        case BNodeKind => node.isBNode
        case LiteralKind => node.isLiteral
        case NonLiteralKind => !node.isLiteral
      }
      if (!kindOk) return false
      val dtOk = nc.datatype.forall { dt =>
        node.isLiteral && literalDt(node) == dt && Xsd.wellFormed(node.lex, dt)
      }
      if (!dtOk) return false
      if (!nc.facets.forall(facetOk(node, _))) return false
      nc.values.forall(vs => vs.exists(valueMatches(node, _)))
    }

    /** Our Term model stores plain strings with dt=xsd:string and lang
     * literals with rdf:langString — both already the RDF 1.1 view. */
    private def literalDt(t: Term): String =
      if (t.lang.nonEmpty) graft.riot.Chars.RDF_LANG_STRING
      else if (t.dt.isEmpty) Term.XSD_STRING
      else t.dt

    private def lexOf(t: Term): String = t.lex

    private def numericValue(t: Term): Option[BigDecimal] = {
      if (!t.isLiteral) return None
      val dt = literalDt(t)
      val numeric = dt.startsWith(Term.XSD) && Xsd.lexRegexFor(dt).isDefined &&
        (dt != Term.XSD + "boolean") && !dt.endsWith("date") &&
        !dt.endsWith("dateTime") && !dt.endsWith("time")
      if (!numeric) return None
      if (!Xsd.wellFormed(t.lex, dt)) return None
      val lex = t.lex.trim
      if (lex.equalsIgnoreCase("INF") || lex.equalsIgnoreCase("-INF") ||
          lex.equalsIgnoreCase("+INF") || lex.equalsIgnoreCase("NaN")) return None
      try Some(BigDecimal(new java.math.BigDecimal(lex)))
      catch { case _: NumberFormatException => None }
    }

    private def facetOk(node: Term, f: Facet): Boolean = f match {
      case Length(n) => codePoints(lexOf(node)) == n
      case MinLength(n) => codePoints(lexOf(node)) >= n
      case MaxLength(n) => codePoints(lexOf(node)) <= n
      case PatternFacet(re, flags) =>
        try Xsd.regex(re, flags).matcher(lexOf(node)).find()
        catch { case _: RuntimeException => false }
      case MinInclusive(v) => numericValue(node).exists(_ >= v)
      case MinExclusive(v) => numericValue(node).exists(_ > v)
      case MaxInclusive(v) => numericValue(node).exists(_ <= v)
      case MaxExclusive(v) => numericValue(node).exists(_ < v)
      case TotalDigits(n) => digitCounts(node).exists(_._1 <= n)
      case FractionDigits(n) => digitCounts(node).exists(_._2 <= n)
    }

    private def codePoints(s: String): Int = s.codePointCount(0, s.length)

    /** (total significant digits, fraction digits) of the literal VALUE —
     * integer-valued decimals canonicalize to no fraction. Only decimal
     * (and derived) datatypes have digit facets (XSD 1.1 §4.3.11). */
    private def digitCounts(t: Term): Option[(Int, Int)] = {
      if (!t.isLiteral) return None
      val dt = literalDt(t)
      val decimalish = dt == Term.XSD + "decimal" || dt == Term.XSD + "integer" ||
        Xsd.intRangeFor(dt).isDefined ||
        Set("nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
            "positiveInteger").map(Term.XSD + _).contains(dt)
      if (!decimalish) return None
      numericValue(t).map { v =>
        // canonical form: drop leading zeros and FRACTIONAL trailing zeros
        // only — integer trailing zeros are significant (1234560 has 7
        // total digits; XSD 1.1 totalDigits)
        var bd = v.underlying.stripTrailingZeros
        if (bd.scale < 0) bd = bd.setScale(0)
        val frac = math.max(bd.scale, 0)
        (bd.precision, frac)
      }
    }

    // ---------------- value sets ----------------
    private def valueMatches(node: Term, v: ValueSetValue): Boolean = v match {
      case TermValue(t) => termEq(node, t)
      case IriStem(prefix) => node.isIri && node.lex.startsWith(prefix)
      case IriStemRange(stem, ex) =>
        node.isIri && stem.forall(node.lex.startsWith) &&
          !ex.exists(excludes(node, _))
      case LiteralStem(prefix) => node.isLiteral && node.lex.startsWith(prefix)
      case LiteralStemRange(stem, ex) =>
        node.isLiteral && stem.forall(node.lex.startsWith) &&
          !ex.exists(excludes(node, _))
      case LanguageValue(tag) =>
        node.isLiteral && node.lang.nonEmpty && node.lang.equalsIgnoreCase(tag)
      case LanguageStem(prefix) => langStemMatches(node, prefix)
      case LanguageStemRange(stem, ex) =>
        stem.map(langStemMatches(node, _)).getOrElse(
          node.isLiteral && node.lang.nonEmpty) && !ex.exists(excludes(node, _))
    }

    private def excludes(node: Term, ex: ValueSetValue): Boolean = ex match {
      case TermValue(t) => termEq(node, t)
      case IriStem(p) => node.isIri && node.lex.startsWith(p)
      case LiteralStem(p) => node.isLiteral && node.lex.startsWith(p)
      case LanguageValue(tag) =>
        node.isLiteral && node.lang.equalsIgnoreCase(tag)
      case LanguageStem(p) => langStemMatches(node, p)
      case other => valueMatches(node, other)
    }

    /** BCP-47 extended filtering: stem "en" matches "en", "en-FR", …;
     * the empty stem matches any language-tagged literal. */
    private def langStemMatches(node: Term, stem: String): Boolean = {
      if (!node.isLiteral || node.lang.isEmpty) return false
      if (stem.isEmpty) return true
      val lang = node.lang.toLowerCase
      val s = stem.toLowerCase
      lang == s || lang.startsWith(s + "-")
    }

    /** Term equality for value sets is STRICT RDF term equality: exact
     * lexical form + datatype (+ case-insensitive language tag) — the
     * suite's NumericEquivalence cases assert that 00 ≠ 0 and 0.0e0 ≠ 0e0
     * even though the values are equal. */
    private def termEq(node: Term, v: Term): Boolean = {
      if (node.kind != v.kind) return false
      if (!node.isLiteral) return node.lex == v.lex
      literalDt(node) == literalDt(v) && node.lex == v.lex &&
        node.lang.equalsIgnoreCase(v.lang)
    }
  }
}
