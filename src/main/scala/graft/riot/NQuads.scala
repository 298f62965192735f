package graft.riot

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.{Quad, Term}

/**
 * N-Quads source/sink (reference: jena-arq/.../riot/lang/LangNQuads.java —
 * "N-Triples plus an optional graph slot before the final dot"). Same
 * distribution story as NTriples: strictly line-oriented, so
 * `spark.read.text` splits on HDFS block boundaries and parsing is a
 * narrow mapPartitions. Lines without a 4th term land in the default
 * graph (Term.defaultGraph), mirroring DatasetGraph.getDefaultGraph.
 */
object NQuads {

  /** Parse one N-Quads line; None for blank lines/comments. Malformed
   * lines raise (strict) or drop. */
  def parseLine(line: String, strict: Boolean = true,
      cache: NTriples.NodeCache = null): Option[Quad] = {
    val s = line.trim
    if (s.isEmpty || s.startsWith("#")) return None
    try {
      val p = new NTriples.LineParser(s, cache)
      val subj = p.term()
      if (subj.kind != Term.KIND_IRI && subj.kind != Term.KIND_BNODE)
        throw new IllegalArgumentException("subject must be an IRI or blank node")
      val pred = p.term()
      if (pred.kind != Term.KIND_IRI)
        throw new IllegalArgumentException("predicate must be an IRI")
      val obj = p.term()
      val g = if (p.peekDot) Term.defaultGraph else p.term()
      if (g.kind != Term.KIND_IRI && g.kind != Term.KIND_BNODE)
        throw new IllegalArgumentException("graph label must be an IRI or blank node")
      p.dot()
      Some(Quad(subj, pred, obj, g))
    } catch {
      case e: IllegalArgumentException =>
        if (strict) throw new IllegalArgumentException(s"bad N-Quads line: $s", e)
        else None
    }
  }

  /** Distributed read: text lines → Dataset[Quad]. */
  def read(spark: SparkSession, path: String, strict: Boolean = true): Dataset[Quad] = {
    import spark.implicits._
    spark.read.textFile(path)
      .mapPartitions { lines =>
        val cache = new NTriples.NodeCache() // per-partition node cache
        lines.flatMap(parseLine(_, strict, cache))
      }
  }

  /** Parse an in-memory document. */
  def parseDocument(content: String, strict: Boolean = true): Seq[Quad] =
    content.linesIterator.flatMap(parseLine(_, strict)).toSeq

  /** Canonical N-Quads lines (default-graph quads print as triples). */
  def format(quads: Dataset[Quad]): Dataset[String] = {
    import quads.sparkSession.implicits._
    quads.map(_.toNQuads)
  }

  /** Canonical lines from a (s,p,o,g) struct-column DataFrame. */
  def formatDF(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.selectExpr("s", "p", "o", "g").as[Quad].map(_.toNQuads)
  }

  def write(quads: Dataset[Quad], path: String): Unit =
    format(quads).write.mode("overwrite").text(path)
}
