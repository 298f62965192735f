package graft.algebra

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.algebra.TermCols._
import graft.model.Term

/**
 * SPARQL aggregate library for `Group` nodes (SURVEY.md §2.4; reference:
 * jena-arq/.../expr/aggregate/Agg*.java). All are compositions of Spark's
 * built-in aggregates, so Catalyst plans them as partial+final hash
 * aggregation with map-side combine — the distributed upgrade of the
 * reference's single-pass in-memory accumulators (QueryIterGroup.java:46).
 *
 * Error semantics mirrored from the reference: a numeric aggregate over a
 * group containing a bound non-numeric value is POISONED — its result is
 * unbound/NULL (AggAvg.java:103 `accumulateError`). Unbound (NULL) inputs
 * are simply skipped, as in SPARQL.
 */
object SparqlAggregates {

  // coalesce: over an EMPTY group max() is NULL, and when(NULL) would make
  // the whole aggregate unbound — but SUM/AVG of the empty group are
  // DEFINED as 0 (SPARQL 18.5.1)
  private def poisoned(t: Column): Column =
    coalesce(max(when(t.isNotNull && !isNumeric(t), 1).otherwise(0)) === 1,
      lit(false))

  private def numAgg(t: Column, f: Column => Column, outDt: String): Column =
    when(!poisoned(t),
      mk(lit(Term.KIND_LIT), f(numValue(t)).cast(StringType), lit(outDt), lit("")))

  /** COUNT(*) */
  def countAll(): Column = intTerm(count(lit(1)))
  /** COUNT(?v) — bound values only. */
  def countVar(t: Column): Column = intTerm(count(t))
  /** COUNT(DISTINCT ?v) */
  def countDistinctVar(t: Column): Column = intTerm(count_distinct(t))

  /** SUM/AVG carry the XSD-promoted result type (max operand rank on the
   * integer<decimal<float<double ladder, NodeValue.java:385): SUM over
   * integers is xsd:integer, AVG over integers is xsd:decimal (XPath
   * fn:avg); SUM of an empty/all-unbound group is integer 0 (SPARQL 18.5.1
   * Sum = Op:Plus fold from 0). */
  def sumAgg(t: Column): Column =
    when(!poisoned(t), numericTerm(
      coalesce(sum(numValue(t)), lit(0.0)),
      coalesce(max(numRank(t)), lit(0))))
  def avgAgg(t: Column): Column =
    when(!poisoned(t), numericTerm(
      coalesce(avg(numValue(t)), lit(0.0)),
      // AVG of the empty group is the INTEGER 0 (Avg({}) = 0, SPARQL
      // 18.5.1), not decimal — rank promotes to decimal only when values
      // exist
      when(count(numValue(t)) === 0, lit(0))
        .otherwise(greatest(coalesce(max(numRank(t)), lit(0)), lit(1)))))
  /** MIN/MAX over the SPARQL total order (NodeCmp) — min_by/max_by on the
   * derived sort key returns the original term. Unbound (NULL) inputs are
   * SKIPPED (AggMin accumulates eval errors silently): min_by/max_by
   * ignore rows whose ordering expression is NULL, so masking the key on
   * unbound terms excludes them without an extra filter. */
  def minAgg(t: Column): Column = min_by(t, when(t.isNotNull, sortKey(t)))
  def maxAgg(t: Column): Column = max_by(t, when(t.isNotNull, sortKey(t)))

  /** SAMPLE — any one bound value (AggSample). */
  def sample(t: Column): Column = first(t, ignoreNulls = true)

  /** SUM(DISTINCT ?v) / AVG(DISTINCT ?v) — the reference's
   * AggSumDistinct / AggAvgDistinct: Distinct applies to the VALUE
   * multiset ("1" and "01" collapse on the numeric shadow), the
   * XSD-promoted result type and error poisoning are unchanged. AVG
   * DISTINCT = sum_distinct / count_distinct (no avg_distinct builtin). */
  def sumDistinctAgg(t: Column): Column =
    when(!poisoned(t), numericTerm(
      coalesce(sum_distinct(numValue(t)), lit(0.0)),
      coalesce(max(numRank(t)), lit(0))))
  def avgDistinctAgg(t: Column): Column =
    when(!poisoned(t), numericTerm(
      coalesce(sum_distinct(numValue(t)) / count_distinct(numValue(t)), lit(0.0)),
      when(count(numValue(t)) === 0, lit(0))
        .otherwise(greatest(coalesce(max(numRank(t)), lit(0)), lit(1)))))

  /** GROUP_CONCAT(?v; separator=sep). Deterministic variant: elements are
   * sorted (the reference concatenates in arrival order, which is only
   * deterministic single-threaded — SURVEY.md §2.4 notes this divergence). */
  def groupConcat(t: Column, sep: String = " "): Column =
    strTerm(concat_ws(sep, sort_array(collect_list(lex(t)))))

  /** GROUP_CONCAT(DISTINCT ?v; separator=sep) — AggGroupConcatDistinct;
   * collect_set dedups, sorted for determinism like groupConcat. */
  def groupConcatDistinct(t: Column, sep: String = " "): Column =
    strTerm(concat_ws(sep, sort_array(collect_set(lex(t)))))

  /** MEDIAN / MODE — ARQ extension aggregates (AggMedian/AggMode), exact. */
  def medianAgg(t: Column): Column =
    when(!poisoned(t), mk(lit(Term.KIND_LIT),
      median(numValue(t)).cast(StringType), lit(Term.XSD_DOUBLE), lit("")))
  def modeAgg(t: Column): Column = mode(t)

  /** FOLD into a CDT list (AggFoldList) — materialized as ArrayType per
   * the CDT mapping (SURVEY.md §1.7); sorted for determinism. */
  def foldList(t: Column): Column = sort_array(collect_list(t))

  /** FOLD(expr …) → a cdt:List LITERAL (AggFoldList proper): optional
   * ORDER BY keys (term sort-key semantics), optional DISTINCT applied
   * AFTER ordering (first occurrence wins). No keys ⇒ arrival order. */
  def foldCdtList(t: Column, distinct: Boolean, keys: Seq[Column],
                  asc: Boolean): Column = {
    // collect_list skips NULLs — wrap in a struct so an unbound input
    // becomes a cdt `null` element instead of vanishing
    val arr0 =
      if (keys.isEmpty)
        transform(collect_list(struct(t.as("t"))), x => x.getField("t"))
      else {
        val st = struct(keys.zipWithIndex.map { case (k, n) =>
          sortKey(k).as(s"k$n") } :+ t.as("t"): _*)
        transform(sort_array(collect_list(st), asc), x => x.getField("t"))
      }
    val arr = if (distinct) array_distinct(arr0) else arr0
    graft.cdt.CdtFunctions.foldListUdf(arr)
  }

  /** FOLD(k, v …) → a cdt:Map literal (AggFoldMap); with ORDER BY, later
   * entries overwrite earlier ones on key collisions. */
  def foldCdtMap(k: Column, v: Column, keys: Seq[Column], asc: Boolean): Column = {
    val pair =
      if (keys.isEmpty) struct(k.as("_1"), v.as("_2"))
      else struct(keys.zipWithIndex.map { case (c, n) =>
        sortKey(c).as(s"k$n") } ++ Seq(k.as("_1"), v.as("_2")): _*)
    val arr0 = collect_list(pair)
    val arr = if (keys.isEmpty) arr0 else sort_array(arr0, asc)
    val pairs = transform(arr,
      x => struct(x.getField("_1").as("_1"), x.getField("_2").as("_2")))
    graft.cdt.CdtFunctions.foldMapPairsUdf(pairs)
  }
}
