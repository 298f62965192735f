package graft.algebra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Term

/**
 * CONSTRUCT template instantiation — the distributed twin of the
 * reference's `TemplateLib.calcTriples` (jena-arq/.../sparql/modify/
 * TemplateLib.java:47–174; SURVEY.md §3.A step 4 calls this "Jena's
 * triple-extraction-from-bindings primitive"). For every solution row and
 * every template pattern, emit one triple with variables substituted.
 *
 * Semantics mirrored from the reference:
 *  - a pattern whose slot has an unbound variable produces NO triple for
 *    that row (TemplateLib skips incomplete triples);
 *  - ill-formed results are skipped too: literal in subject or predicate
 *    position, bnode in predicate position;
 *  - a blank node in the template is remapped to a FRESH bnode per
 *    solution row, shared across patterns of the same template row
 *    (TemplateLib.java:81,121–174 per-row bnode remapping). Labels are
 *    derived from a per-row id, unique within the run.
 */
object Construct {

  /** Tag each solution row with `__row` and PIN the assignment with an
   * eager localCheckpoint when the template mints bnodes: the tagged
   * frame is unioned across N template-pattern branches, and
   * `monotonically_increasing_id` is partition-order-dependent — a task
   * retry or AQE re-plan between branches could otherwise assign
   * DIFFERENT ids to the same solution row, silently breaking
   * cross-pattern bnode co-reference. Same device as Compiler.tagged.
   * Bnode-FREE templates never read `__row`, so they skip both the tag
   * and the materialization — a multi-branch bnode-free CONSTRUCT
   * re-evaluates the solutions subplan per branch rather than paying an
   * eager full-solution checkpoint (the cheaper trade at scale: the
   * branches are projections the optimizer can prune, the checkpoint is
   * a forced materialization of every column). */
  private def rowTagged(solutions: DataFrame,
                        hasBnodes: Boolean): DataFrame =
    if (hasBnodes)
      solutions.withColumn("__row", monotonically_increasing_id())
        .localCheckpoint(true)
    else solutions

  /** Pattern slots: constants, solution variables, or template bnodes
   * (`TConst(Term.bnode(label))` is treated as a template bnode). */
  def construct(template: Seq[TriplePattern], solutions: DataFrame): DataFrame = {
    // one per-row id shared by all patterns of the row: template bnode
    // labels become label_rowid (fresh per row, stable within the row)
    val hasBnodes = template.exists(tp =>
      Seq(tp.s, tp.p, tp.o).exists { case TConst(t) => t.isBNode; case _ => false })
    val withRow = rowTagged(solutions, hasBnodes)

    def slotCol(p: TermPat): Column = p match {
      case TConst(t) if t.isBNode =>
        TermCols.mk(lit(Term.KIND_BNODE),
          concat(lit(t.lex + "_r"), col("__row")), lit(""), lit(""))
      case TConst(t) => TermCols.const(t)
      case TVar(n) if withRow.columns.contains(n) => col(n)
      case _ => lit(null).cast(TermCols.schema)
    }

    val parts = template.map { tp =>
      val s = slotCol(tp.s); val p = slotCol(tp.p); val o = slotCol(tp.o)
      withRow.select(s.as("s"), p.as("p"), o.as("o"))
        .where(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
        // well-formedness: no literal subject, predicate must be an IRI
        .where(TermCols.kind(col("s")) =!= Term.KIND_LIT)
        .where(TermCols.isIri(col("p")))
    }
    // CONSTRUCT output is a GRAPH — set semantics (Graph.add dedupes)
    parts.reduce(_.union(_)).dropDuplicates("s", "p", "o")
  }

  /** Quad template instantiation for SPARQL Update (UpdateEngineWorker's
   * TemplateLib.template over quads): like `construct` plus a graph slot
   * per pattern — `None` targets `defaultG` (the dataset default or the
   * WITH graph), a variable slot takes its per-solution binding (skipped
   * unless bound to an IRI — graph names are IRIs). Returns (s,p,o,g). */
  def constructQuads(template: Seq[graft.sparql.Parser.QuadPat],
                     solutions: DataFrame, defaultG: Term,
                     bnodeScope: String = ""): DataFrame = {
    val hasBnodes = template.exists { case graft.sparql.Parser.QuadPat(gp, tp) =>
      (gp.toSeq ++ Seq(tp.s, tp.p, tp.o))
        .exists { case TConst(t) => t.isBNode; case _ => false }
    }
    val withRow = rowTagged(solutions, hasBnodes)
    def slotCol(p: TermPat): Column = p match {
      case TConst(t) if t.isBNode =>
        // labels are fresh per (bnodeScope, solution row): one scope per
        // DATA request / per template EXECUTION (two INSERT WHERE ops in
        // one request mint DIFFERENT bnodes — the W3C same-bnode cases)
        TermCols.mk(lit(Term.KIND_BNODE),
          concat(lit(t.lex + bnodeScope + "_r"), col("__row")), lit(""), lit(""))
      case TConst(t) => TermCols.const(t)
      case TVar(n) if withRow.columns.contains(n) => col(n)
      case _ => lit(null).cast(TermCols.schema)
    }
    val parts = template.map { case graft.sparql.Parser.QuadPat(gp, tp) =>
      val s = slotCol(tp.s); val p = slotCol(tp.p); val o = slotCol(tp.o)
      val g = gp.map(slotCol).getOrElse(TermCols.const(defaultG))
      withRow.select(s.as("s"), p.as("p"), o.as("o"), g.as("g"))
        .where(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
        .where(TermCols.kind(col("s")) =!= Term.KIND_LIT)
        .where(TermCols.isIri(col("p")))
        .where(TermCols.isIri(col("g")))
    }
    if (parts.isEmpty)
      withRow.limit(0).select(
        lit(null).cast(TermCols.schema).as("s"), lit(null).cast(TermCols.schema).as("p"),
        lit(null).cast(TermCols.schema).as("o"), lit(null).cast(TermCols.schema).as("g"))
    else parts.reduce(_.union(_)).dropDuplicates("s", "p", "o", "g")
  }
}
