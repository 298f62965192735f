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

  /** Parsed keyword query: bare terms, quoted phrases, FUZZY terms
   * (`term~` / `term~1` / `term~2` — Lucene FuzzyQuery, default
   * maxEdits 2), NEGATED terms/phrases (`-term`, `-"..."`, or a `NOT`
   * keyword — Lucene's prohibit operator), and whether an explicit AND
   * appeared (Lucene's default operator is OR). Reference query-parser
   * surface: TextIndexLucene.java:60 (QueryParser syntax). */
  final case class ParsedQuery(terms: Seq[String], phrases: Seq[String],
                               fuzzy: Seq[(String, Int)] = Nil,
                               notTerms: Seq[String] = Nil,
                               notPhrases: Seq[String] = Nil,
                               conj: Boolean = false) {
    require(terms.nonEmpty || phrases.nonEmpty || fuzzy.nonEmpty,
      "text query needs at least one positive term or phrase")
  }

  def parseQuery(q: String): ParsedQuery = {
    // units: optionally-negated phrase, or optionally-negated word with an
    // optional trailing fuzzy marker
    val unitRe = """(-?)"([^"]*)"|(-?)([^\s"]+)""".r
    var terms = Vector[String]()
    var phrases = Vector[String]()
    var fuzzy = Vector[(String, Int)]()
    var notTerms = Vector[String]()
    var notPhrases = Vector[String]()
    var conj = false
    var pendingNot = false
    def analyze(w: String): Seq[String] =
      w.toLowerCase.split(s"[^\\p{L}\\p{Nd}]+").toSeq.filter(_.nonEmpty)
    unitRe.findAllMatchIn(q).foreach { m =>
      if (m.group(2) != null) { // phrase
        val neg = m.group(1) == "-" || pendingNot
        pendingNot = false
        val p = m.group(2).toLowerCase
        if (p.nonEmpty) {
          if (neg) notPhrases :+= p else phrases :+= p
        }
      } else {
        val neg0 = m.group(3) == "-"
        val w0 = m.group(4)
        if (w0 == "AND") conj = true
        else if (w0 == "OR") ()
        else if (w0 == "NOT") pendingNot = true
        else {
          val neg = neg0 || pendingNot
          pendingNot = false
          val fuzzyRe = """(.+?)~(\d?)$""".r
          w0 match {
            case fuzzyRe(base, d) if !neg =>
              val dist = if (d.isEmpty) 2 else d.toInt
              analyze(base).foreach(t => fuzzy :+= (t, math.min(dist, 2)))
            case fuzzyRe(base, _) => // negated fuzzy degrades to exact NOT
              notTerms ++= analyze(base)
            case w =>
              if (neg) notTerms ++= analyze(w) else terms ++= analyze(w)
          }
        }
      }
    }
    ParsedQuery(terms.distinct, phrases.distinct, fuzzy.distinct,
      notTerms.distinct, notPhrases.distinct, conj)
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
    val spark = graph.sparkSession
    import spark.implicits._
    val pq = parseQuery(q)
    val preds = pred.toSeq
    // SLOT TABLE: each positive query term is a slot; a fuzzy term's slot
    // is filled by every vocabulary token within its edit distance (the
    // distributed analog of Lucene's FuzzyQuery term-dictionary automaton
    // walk: the DISTINCT token vocabulary is scanned once per query, with
    // a length prefilter, never the corpus). Scoring counts SLOTS, so a
    // fuzzy term matching three vocabulary tokens still scores 1 — same
    // as Lucene's one-query-term semantics.
    val exactSlots =
      if (pq.terms.isEmpty) None
      else Some(pq.terms.zipWithIndex.toDF("token", "__slot"))
    val fuzzySlots =
      if (pq.fuzzy.isEmpty) None
      else {
        val vocab = postings(graph, preds).select(col("token")).distinct()
        Some(pq.fuzzy.zipWithIndex.map { case ((t, d), j) =>
          vocab
            .filter(length(col("token")).between(t.length - d, t.length + d))
            .filter(levenshtein(col("token"), lit(t)) <= d)
            .select(col("token"), lit(pq.terms.size + j).as("__slot"))
        }.reduce(_ union _))
      }
    val slotTable = (exactSlots, fuzzySlots) match {
      case (Some(e), Some(f)) => Some(e.union(f))
      case (e, f) => e.orElse(f)
    }
    val nPosSlots = pq.terms.size + pq.fuzzy.size
    // term hits: candidate rows from the postings, joined to the (tiny,
    // broadcast) slot table BEFORE any shuffle; __tc = matched slots
    val termHits = slotTable.map(st =>
      postings(graph, preds)
        .join(broadcast(st), "token")
        .groupBy(col("s"), col("o"))
        .agg(count_distinct(col("__slot")).as("__tc")))
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
    val scored0 = based.withColumn("__pc", pc)
      .filter(
        if (pq.conj) col("__tc") === nPosSlots && col("__pc") === pq.phrases.size
        else (col("__tc") + col("__pc")) > 0)
      .select(col("s"), col("o"), (col("__tc") + col("__pc")).as("score"))
    // NOT operator (Lucene prohibit): drop candidates whose literal
    // contains any excluded token (postings anti-join — same isin pruning
    // as the positive probe) or excluded phrase (post-filter)
    val scored1 =
      if (pq.notTerms.isEmpty) scored0
      else scored0.join(
        postings(graph, preds).filter(col("token").isin(pq.notTerms: _*))
          .select(col("s"), col("o")).distinct(),
        Seq("s", "o"), "left_anti")
    val scored = pq.notPhrases.foldLeft(scored1)((d, p) =>
      d.filter(!lower(TermCols.lex(col("o"))).contains(p)))
    limit match {
      case Some(n) =>
        scored.orderBy(col("score").desc, TermCols.lex(col("s")),
          TermCols.lex(col("o"))).limit(n)
      case None => scored
    }
  }
}
