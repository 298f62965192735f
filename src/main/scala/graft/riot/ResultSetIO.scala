package graft.riot

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.algebra.TermCols
import graft.model.Term

/**
 * SPARQL result-set writers (SURVEY.md §2.1 "result-set I/O"; reference:
 * riot/rowset/rw/RowSetWriterJSON.java and RowSetWriterCSV.java). A
 * solution DataFrame (one term-struct column per variable) serializes to:
 *
 *  - the W3C "SPARQL 1.1 Query Results JSON Format": one binding object
 *    per row, built entirely with column expressions (`to_json` over a
 *    struct of per-var objects) — distributed, no driver loop;
 *  - the Results CSV format: lexical forms only, Spark's csv writer.
 */
object ResultSetIO {

  /** One results-JSON binding object per solution row (distributed). */
  def bindingsJson(solutions: DataFrame): Dataset[String] = {
    val spark = solutions.sparkSession
    import spark.implicits._
    val vars = solutions.columns.toSeq
    val obj = struct(vars.map(v => termJson(col(v)).as(v)): _*)
    solutions.select(to_json(obj, Map("ignoreNullFields" -> "true")).as("j")).as[String]
  }

  /** Whole W3C results document (head + bindings); collects — intended for
   * query RESULTS, which are small by construction (LIMIT'd / aggregated).
   * For bulk exports use `bindingsJson` + write.text. */
  def toSparqlJson(solutions: DataFrame): String = {
    val vars = solutions.columns.toSeq
    val head = vars.map("\"" + _ + "\"").mkString("[", ",", "]")
    val rows = bindingsJson(solutions).collect()
    s"""{"head":{"vars":$head},"results":{"bindings":[${rows.mkString(",")}]}}"""
  }

  /** Per-term JSON object column: {"type":…,"value":…,(...)}. */
  private def termJson(t: Column): Column = {
    val typ = when(TermCols.kind(t) === Term.KIND_IRI, "uri")
      .when(TermCols.kind(t) === Term.KIND_BNODE, "bnode")
      .otherwise("literal")
    when(t.isNotNull, struct(
      typ.as("type"),
      TermCols.lex(t).as("value"),
      when(TermCols.isLiteral(t) && TermCols.lang(t) =!= "",
        TermCols.lang(t)).as("xml:lang"),
      when(TermCols.isLiteral(t) && TermCols.lang(t) === "" &&
        TermCols.dt(t) =!= "" && TermCols.dt(t) =!= Term.XSD_STRING,
        TermCols.dt(t)).as("datatype")))
  }

  /** SPARQL results CSV: header of variable names, lexical values only
   * (riot/rowset/rw CSV semantics). */
  def writeCsv(solutions: DataFrame, path: String): Unit =
    solutions.select(solutions.columns.map(v =>
      TermCols.lex(col(v)).as(v)): _*)
      .write.mode("overwrite").option("header", "true").csv(path)
}
