package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.algebra.TermCols
import graft.model.Term

/**
 * Analyzed text-index analog of the reference's jena-text module
 * (jena-text/src/main/java/org/apache/jena/query/text/TextQueryPF.java:65,
 * TextIndexLucene.java:60): token postings over the graph's string
 * literals plus a `text:query`-shaped keyword lookup.
 *
 * Spark-first shape: instead of a Lucene sidecar index, the analyzed
 * postings are a (s, p, o, token) DataFrame — at 100 TB this is a
 * materialized, token-bucketed store layout beside SPO/POS/OSP (the moral
 * twin of the inverted index; build it once with [[postings]] and write it
 * partitioned by token prefix). A keyword query filters the postings on
 * its few query tokens — a pushable `isin` over the token column, so a
 * token-partitioned layout prunes everything else — then aggregates
 * matched-term counts per (subject, literal): one narrow shuffle keyed by
 * subject. Phrase terms (quoted) post-filter the candidate literals by
 * substring; a phrase-only query is a full literal scan, exactly as it
 * would be on Lucene without an n-gram field (documented).
 *
 * Scoring deviation (documented): Lucene's TF-IDF/BM25 float is replaced
 * by the matched-distinct-term count (terms + phrases), a deterministic,
 * cluster-stable integer — Lucene's own scores depend on index layout and
 * segment merges, so no oracle could pin them.
 */
object TextIndex {

  /** StandardAnalyzer stand-in: lowercase, Unicode letter/digit runs. */
  val TokenPattern = "[\\p{L}\\p{Nd}]+"

  /** Analyzed distinct tokens of a string column. Backslashes are doubled
   * for the SQL string-literal parser (expr() unescapes once). */
  def analyzeTokensExpr(colName: String): String = {
    val sqlPattern = TokenPattern.replace("\\", "\\\\")
    s"array_distinct(regexp_extract_all(lower($colName), '$sqlPattern', 0))"
  }

  /** Token postings over the graph's literal objects: one row per
   * (s, p, o-literal, distinct analyzed token). `predicates` restricts to
   * the configured indexed properties (jena-text entity-map analog);
   * empty = index every literal. */
  def postings(graph: DataFrame, predicates: Seq[String] = Nil): DataFrame =
    scopedLiterals(graph, predicates)
      .select(col("s"), col("p"), col("o"),
        explode(expr(analyzeTokensExpr("o.lex"))).as("token"))

  private def scopedLiterals(graph: DataFrame, predicates: Seq[String]): DataFrame = {
    val base = graph.filter(TermCols.kind(col("o")) === Term.KIND_LIT)
    if (predicates.isEmpty) base
    else base.filter(TermCols.isIri(col("p")) &&
      TermCols.lex(col("p")).isin(predicates: _*))
  }

  /** Parsed keyword query: bare terms, quoted phrases, and whether an
   * explicit AND appeared (Lucene's default operator is OR). */
  final case class ParsedQuery(terms: Seq[String], phrases: Seq[String],
                               conj: Boolean) {
    require(terms.nonEmpty || phrases.nonEmpty, "empty text query")
  }

  def parseQuery(q: String): ParsedQuery = {
    val phraseRe = "\"([^\"]*)\"".r
    val phrases = phraseRe.findAllMatchIn(q).map(_.group(1).toLowerCase)
      .filter(_.nonEmpty).toSeq.distinct
    val rest = phraseRe.replaceAllIn(q, " ")
    val raw = rest.split("\\s+").toSeq.filter(_.nonEmpty)
    val conj = raw.contains("AND")
    val terms = raw.filterNot(t => t == "AND" || t == "OR")
      .flatMap(_.toLowerCase.split(s"[^\\p{L}\\p{Nd}]+")).filter(_.nonEmpty)
      .distinct
    ParsedQuery(terms, phrases, conj)
  }

  /**
   * Keyword search: (s, o, score) rows, one per matching (subject,
   * literal). OR semantics by default (any term/phrase), AND when the
   * query contains an explicit `AND` (all terms AND all phrases). `limit`
   * keeps the global top-N by score (the index-level limit of
   * TextQueryPF), deterministically tie-broken by subject/literal.
   */
  def search(graph: DataFrame, pred: Option[String], q: String,
             limit: Option[Int]): DataFrame = {
    val pq = parseQuery(q)
    val preds = pred.toSeq
    // term hits: candidate rows from the postings, pruned to the query's
    // tokens BEFORE any shuffle; __tc = matched distinct terms
    val termHits =
      if (pq.terms.isEmpty) None
      else Some(postings(graph, preds)
        .filter(col("token").isin(pq.terms: _*))
        .groupBy(col("s"), col("o"))
        .agg(count_distinct(col("token")).as("__tc")))
    // candidate set: term hits suffice when every phrase-match must also
    // term-match (AND with ≥1 term) or there are no phrases; otherwise a
    // phrase can match literals with NO term hit, so widen to the scoped
    // literal scan (what phrase search costs without an n-gram field)
    val based: DataFrame = termHits match {
      case Some(th) if pq.phrases.isEmpty || pq.conj => th
      case Some(th) =>
        scopedLiterals(graph, preds).select(col("s"), col("o")).distinct()
          .join(th, Seq("s", "o"), "left_outer")
          .withColumn("__tc", coalesce(col("__tc"), lit(0L)))
      case None =>
        scopedLiterals(graph, preds).select(col("s"), col("o")).distinct()
          .withColumn("__tc", lit(0L))
    }
    val pc: Column =
      if (pq.phrases.isEmpty) lit(0L)
      else pq.phrases.map(p =>
        when(lower(TermCols.lex(col("o"))).contains(p), 1L).otherwise(0L))
        .reduce(_ + _)
    val scored = based.withColumn("__pc", pc)
      .filter(
        if (pq.conj) col("__tc") === pq.terms.size && col("__pc") === pq.phrases.size
        else (col("__tc") + col("__pc")) > 0)
      .select(col("s"), col("o"), (col("__tc") + col("__pc")).as("score"))
    limit match {
      case Some(n) =>
        scored.orderBy(col("score").desc, TermCols.lex(col("s")),
          TermCols.lex(col("o"))).limit(n)
      case None => scored
    }
  }
}
