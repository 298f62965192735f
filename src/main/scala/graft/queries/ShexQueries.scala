package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.{Term, Triple}
import graft.shex.ShexOps

/**
 * Oracle-gated ShEx validation: every document row becomes a tiny
 * document-KG (text/lang/n_chars/source triples) validated against a
 * ShExC schema — parser, node constraints (value set, numeric facet,
 * pattern, nodeKind, datatype with lexical validity) and the shape
 * matcher all on the distributed path. The DuckDB oracle restates the
 * conformance predicate relationally.
 */
object ShexQueries {

  private val D = "urn:doc:"

  private val schemaText = """
    PREFIX d: <urn:p:>
    PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
    <urn:g:DocShape> {
      d:text LITERAL ;
      d:lang ["en" "de" "fr"] ;
      d:nchars xsd:integer MININCLUSIVE 100 ;
      d:source IRI /^urn:src:src[0-9]$/
    }
  """

  def v3_shex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val schema = ShexOps.parseSchema(schemaText)
    val rows = Tables.documents(s, d)
      .select(col("doc_id").cast("long"), col("text"), col("lang"),
        col("n_chars").cast("long"), col("source"))
      .as[(Long, String, String, Long, String)]
      .map { case (id, text, lang, nchars, source) =>
        val focus = Term.iri(D + id)
        val g = Seq(
          Triple(focus, Term.iri("urn:p:text"), Term.string(text)),
          Triple(focus, Term.iri("urn:p:lang"), Term.string(lang)),
          Triple(focus, Term.iri("urn:p:nchars"),
            Term.lit(nchars.toString, Term.XSD_INTEGER)),
          Triple(focus, Term.iri("urn:p:source"), Term.iri("urn:src:" + source)))
        (id, g, focus)
      }
    ShexOps.validateGraphs(rows, schema, "urn:g:DocShape")
      .toDF("doc_id", "conforms")
  }

  val oracle: Map[String, String] = Map(
    "v3_shex" -> """
      SELECT doc_id,
             (lang IN ('en','de','fr')
              AND n_chars >= 100
              AND regexp_matches('urn:src:' || source, '^urn:src:src[0-9]$'))
               AS conforms
      FROM documents""")
}
