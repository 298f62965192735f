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

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  /** rdfs:member-style container membership (pfunction/library container):
   * bind `memberVar` to the objects of rdf:_1, rdf:_2, … triples whose
   * subject is `containerVar`'s term — a generator join against the
   * graph, shuffling on the container term like any BGP join. */
  def containerMember(solutions: DataFrame, graph: DataFrame,
                      containerVar: String, memberVar: String): DataFrame = {
    val members = graph
      .filter(TermCols.isIri(col("p")) &&
        lex(col("p")).rlike("^" + java.util.regex.Pattern.quote(RDF) + "_[0-9]+$"))
      .select(col("s").as("__cont"), col("o").as(memberVar))
    solutions.join(members, col(containerVar) === col("__cont")).drop("__cont")
  }

  /** apf:bag / apf:seq / apf:alt — container membership restricted to
   * containers with the given rdf:type (Bag/Seq/Alt). */
  def containerOfType(solutions: DataFrame, graph: DataFrame, typeLocal: String,
                      containerVar: String, memberVar: String): DataFrame = {
    val typed = graph.filter(
      TermCols.isIri(col("p")) && lex(col("p")) === (RDF + "type") &&
        TermCols.isIri(col("o")) && lex(col("o")) === (RDF + typeLocal))
      .select(col("s").as("__typed"))
    val restricted = solutions.join(typed,
      col(containerVar) === col("__typed"), "left_semi")
    containerMember(restricted, graph, containerVar, memberVar)
  }

  /** apf:assign — bind a computed column (the property-function face of
   * Extend; kept for library parity with pfunction/library/assign). */
  def assign(solutions: DataFrame, outVar: String,
             e: org.apache.spark.sql.Column): DataFrame =
    solutions.withColumn(outVar, e)

  /** apf:concat — outVar := concatenation of the input vars' lexical
   * forms (pfunction/library/concat). */
  def concatVars(solutions: DataFrame, outVar: String, inVars: String*): DataFrame =
    solutions.withColumn(outVar,
      strTerm(concat(inVars.map(v => lex(col(v))): _*)))

  /** apf:localname / apf:namespace — IRI split at the last '#' or '/'. */
  def localname(solutions: DataFrame, iriVar: String, outVar: String): DataFrame =
    solutions.withColumn(outVar,
      strTerm(regexp_extract(lex(col(iriVar)), "([^/#]*)$", 1)))
  def namespace(solutions: DataFrame, iriVar: String, outVar: String): DataFrame =
    solutions.withColumn(outVar, strTerm(
      expr(s"substring($iriVar.lex, 1, length($iriVar.lex) - length(regexp_extract($iriVar.lex, '([^/#]*)$$', 1)))")))
}
