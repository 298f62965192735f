package graft.algebra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.algebra.TermCols.{lex, strTerm}

/**
 * Property functions — "magic predicates" that GENERATE bindings rather
 * than match stored triples (SURVEY.md §2.10; reference:
 * sparql/pfunction/library/ — splitIRI, strSplit, listMember, container…,
 * executed via QueryIterProcedure). The Spark mapping is a generator
 * column (`explode`) or a derived-column transform over the solution set;
 * each function here is `DataFrame => DataFrame` over solution columns,
 * i.e. exactly the OpProcedure contract ("registered Scala transform",
 * SURVEY.md §2.10a).
 */
object PropFuncs {

  /** apf:strSplit — one row per separator-split part of `inVar`'s lexical
   * form, bound to `outVar`. */
  def strSplit(solutions: DataFrame, inVar: String, sep: String, outVar: String): DataFrame =
    solutions.withColumn(outVar,
      explode(split(lex(col(inVar)), java.util.regex.Pattern.quote(sep))))
      .withColumn(outVar, strTerm(col(outVar)))

  /** apf:splitIRI — bind namespace and local name of an IRI (split at the
   * last '#' or '/'). */
  def splitIri(solutions: DataFrame, iriVar: String,
               nsVar: String, localVar: String): DataFrame = {
    val iri = lex(col(iriVar))
    val local = regexp_extract(iri, "([^/#]*)$", 1)
    val ns = expr(s"substring(${iriCol(iriVar)}, 1, length(${iriCol(iriVar)}) - length(regexp_extract(${iriCol(iriVar)}, '([^/#]*)$$', 1)))")
    solutions
      .withColumn(nsVar, strTerm(ns))
      .withColumn(localVar, strTerm(local))
  }
  private def iriCol(v: String) = s"$v.lex"

  /** list:member over a materialized CDT list column. */
  def listMember(solutions: DataFrame, listVar: String, outVar: String): DataFrame =
    solutions.withColumn(outVar, explode(col(listVar)))

  /** list:index — (index, member) pairs, 1-based like list:index's output. */
  def listIndex(solutions: DataFrame, listVar: String,
                idxVar: String, outVar: String): DataFrame =
    solutions
      .select(col("*"), posexplode(col(listVar)).as(Seq("__i", outVar)))
      .withColumn(idxVar, TermCols.intTerm(col("__i") + 1)).drop("__i")

  /** list:length. */
  def listLength(solutions: DataFrame, listVar: String, outVar: String): DataFrame =
    solutions.withColumn(outVar, TermCols.intTerm(size(col(listVar))))
}
