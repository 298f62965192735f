package graft.shex

import graft.model.Term

/**
 * ShEx 2.1 abstract syntax (reference: jena-shex
 * src/main/java/org/apache/jena/shex/expressions — ShapeExpression.java,
 * TripleExpression.java and friends; spec grammar: shexSpec ShExC). The
 * AST mirrors ShExJ's structure: a schema is a map
 * of shape-expression labels to shape expressions, plus an optional
 * `start` expression; triple-expression labels ($label / &ref) are kept
 * in a separate map and INLINED (fresh copies) before validation so every
 * TripleConstraint occurrence is unique — the validator's bag matcher
 * relies on each constraint belonging to exactly one spot in the tree.
 */
object ShexAst {

  /** %<iri>{ code %} — code is None for the bare `%iri%` form. */
  final case class SemAct(iri: String, code: Option[String])

  sealed trait ShapeExpr
  final case class ShapeAnd(es: List[ShapeExpr]) extends ShapeExpr
  final case class ShapeOr(es: List[ShapeExpr]) extends ShapeExpr
  final case class ShapeNot(e: ShapeExpr) extends ShapeExpr
  /** Reference to a labeled shape expression (`@<S>`); label is the IRI
   * string or `_:label` for blank-node labels. */
  final case class ShapeRef(label: String) extends ShapeExpr
  /** `EXTERNAL` — resolvable only with an external-shape resolver; the
   * validator raises (the reference excludes these tests too). */
  case object ShapeExternal extends ShapeExpr

  sealed trait NodeKind
  case object IriKind extends NodeKind
  case object BNodeKind extends NodeKind
  case object LiteralKind extends NodeKind
  case object NonLiteralKind extends NodeKind

  sealed trait Facet
  final case class Length(n: Int) extends Facet
  final case class MinLength(n: Int) extends Facet
  final case class MaxLength(n: Int) extends Facet
  final case class PatternFacet(regex: String, flags: String) extends Facet
  /** bound carries the parsed numeric literal (Term keeps its datatype). */
  final case class MinInclusive(v: BigDecimal) extends Facet
  final case class MinExclusive(v: BigDecimal) extends Facet
  final case class MaxInclusive(v: BigDecimal) extends Facet
  final case class MaxExclusive(v: BigDecimal) extends Facet
  final case class TotalDigits(n: Int) extends Facet
  final case class FractionDigits(n: Int) extends Facet

  sealed trait ValueSetValue
  /** exact term (IRI or literal; literals compare by lexical form +
   * datatype + language with numeric/boolean value equivalence handled
   * in the validator). */
  final case class TermValue(t: Term) extends ValueSetValue
  final case class IriStem(prefix: String) extends ValueSetValue
  /** stem=None is the wildcard `.`; exclusions are TermValue / *Stem. */
  final case class IriStemRange(stem: Option[String],
                                exclusions: List[ValueSetValue]) extends ValueSetValue
  final case class LiteralStem(prefix: String) extends ValueSetValue
  final case class LiteralStemRange(stem: Option[String],
                                    exclusions: List[ValueSetValue]) extends ValueSetValue
  /** `@en` exact language tag (case-insensitive). */
  final case class LanguageValue(tag: String) extends ValueSetValue
  /** `@en~` / `@~`: BCP-47 extended filtering stem (en matches en-FR). */
  final case class LanguageStem(prefix: String) extends ValueSetValue
  final case class LanguageStemRange(stem: Option[String],
                                     exclusions: List[ValueSetValue]) extends ValueSetValue

  final case class NodeConstraint(
      kind: Option[NodeKind] = None,
      datatype: Option[String] = None,
      facets: List[Facet] = Nil,
      values: Option[List[ValueSetValue]] = None,
      semActs: List[SemAct] = Nil) extends ShapeExpr

  final case class Shape(
      closed: Boolean,
      extra: Set[String],
      expr: Option[TripleExpr],
      semActs: List[SemAct]) extends ShapeExpr

  /** max = -1 encodes unbounded (`*`, `+`, `{n,}`, `{n,*}`). */
  sealed trait TripleExpr { def min: Int; def max: Int }
  final case class TripleConstraint(
      inverse: Boolean, pred: String, value: Option[ShapeExpr],
      min: Int, max: Int, semActs: List[SemAct]) extends TripleExpr
  final case class EachOf(es: List[TripleExpr], min: Int, max: Int,
                          semActs: List[SemAct]) extends TripleExpr
  final case class OneOf(es: List[TripleExpr], min: Int, max: Int,
                         semActs: List[SemAct]) extends TripleExpr
  /** `&label` include — inlined by `ShexSchema.resolved` before use. */
  final case class TripleExprRef(label: String) extends TripleExpr {
    def min = 1; def max = 1
  }

  final case class ShexSchema(
      start: Option[ShapeExpr],
      shapes: Map[String, ShapeExpr],
      shapeOrder: List[String],
      tripleExprs: Map[String, TripleExpr],
      startActs: List[SemAct]) {

    /** Inline every TripleExprRef (cycle-checked) so downstream code never
     * sees a ref. Mirrors the reference's schema-building include
     * resolution (jena-shex ShapesSchemaBuilder). */
    def resolved: ShexSchema = {
      def inTe(e: TripleExpr, seen: Set[String]): TripleExpr = e match {
        case TripleExprRef(l) =>
          if (seen.contains(l)) throw new ShexException(s"cyclic triple-expression include: $l")
          val body = tripleExprs.getOrElse(l,
            throw new ShexException(s"undefined triple-expression label: $l"))
          inTe(body, seen + l)
        case EachOf(es, m, x, sa) => EachOf(es.map(inTe(_, seen)), m, x, sa)
        case OneOf(es, m, x, sa) => OneOf(es.map(inTe(_, seen)), m, x, sa)
        case tc @ TripleConstraint(_, _, v, _, _, _) =>
          tc.copy(value = v.map(inSe(_, seen)))
      }
      def inSe(e: ShapeExpr, seen: Set[String]): ShapeExpr = e match {
        case ShapeAnd(es) => ShapeAnd(es.map(inSe(_, seen)))
        case ShapeOr(es) => ShapeOr(es.map(inSe(_, seen)))
        case ShapeNot(x) => ShapeNot(inSe(x, seen))
        case s @ Shape(_, _, expr, _) => s.copy(expr = expr.map(inTe(_, seen)))
        case other => other
      }
      copy(start = start.map(inSe(_, Set.empty)),
        shapes = shapes.map { case (k, v) => k -> inSe(v, Set.empty) })
    }
  }

  final class ShexException(msg: String) extends RuntimeException(msg)
  /** Syntax errors get their own type so BadSyntax tests can assert on it. */
  final class ShexParseException(msg: String) extends RuntimeException(msg)
}
