package graft.riot

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Term

/**
 * Turtle writer (reference: riot/writer/TurtleWriter.java family) —
 * subject-grouped blocks with ';'-chained predicates and prefix
 * compaction. Distribution shape: one groupBy(subject) shuffle, then each
 * output PARTITION is a standalone valid Turtle document (the prologue is
 * emitted at the head of every partition via mapPartitions), so the
 * writer scales without a driver-side collect and the part files
 * concatenate into one valid document (repeated @prefix decls are legal).
 */
object TurtleWriter {

  private val RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** Turtle text lines from a (s,p,o) term-struct DataFrame. */
  def format(triples: DataFrame,
             prefixes: Map[String, String] = Map.empty): Dataset[String] = {
    val spark = triples.sparkSession
    import spark.implicits._

    val grouped = triples
      .groupBy(col("s"))
      .agg(sort_array(collect_list(
        struct(col("p").as("_1"), col("o").as("_2")))).as("pos"))
      .select(col("s").as("_1"), col("pos").as("_2"))
      .as[(Term, Seq[(Term, Term)])]

    val pfx = prefixes.toSeq.sortBy(_._1)
    grouped.mapPartitions { it =>
      val header = pfx.map { case (p, ns) => s"@prefix $p: <$ns> ." }.iterator
      header ++ it.map { case (s, pos) => subjectBlock(s, pos, pfx) }
    }
  }

  def write(triples: DataFrame, path: String,
            prefixes: Map[String, String] = Map.empty): Unit =
    format(triples, prefixes).write.mode("overwrite").text(path)

  /** TriG text from a (s,p,o,g) quad DataFrame (riot TriG writer analog):
   * default-graph triples print bare, named graphs as `<g> { ... }`
   * blocks. One groupBy(g, s) shuffle; same per-partition-standalone
   * property as `format` (each part is a valid TriG document). */
  def formatTrig(quads: DataFrame,
                 prefixes: Map[String, String] = Map.empty): Dataset[String] = {
    val spark = quads.sparkSession
    import spark.implicits._
    val grouped = quads
      .groupBy(col("g"), col("s"))
      .agg(sort_array(collect_list(
        struct(col("p").as("_1"), col("o").as("_2")))).as("pos"))
      .select(col("g").as("_1"), col("s").as("_2"), col("pos").as("_3"))
      .as[(Term, Term, Seq[(Term, Term)])]
      // co-locate each graph's blocks so a graph's block set stays within
      // one partition (valid TriG needs one { } per graph per document —
      // per PART here, which repartitioning by g guarantees)
      .repartition(col("_1"))
    val pfx = prefixes.toSeq.sortBy(_._1)
    grouped.mapPartitions { it =>
      val header = pfx.map { case (p, ns) => s"@prefix $p: <$ns> ." }.iterator
      val byGraph = it.toSeq.groupBy(_._1).toSeq.sortBy(_._1.lex)
      val blocks = byGraph.iterator.map { case (g, rows) =>
        val body = rows.sortBy(_._2.lex).map { case (_, s, pos) =>
          subjectBlock(s, pos, pfx)
        }.mkString("\n")
        if (g.lex == Term.DEFAULT_GRAPH) body
        else term(g, pfx) + " {\n" + body + "\n}"
      }
      header ++ blocks
    }
  }

  def writeTrig(quads: DataFrame, path: String,
                prefixes: Map[String, String] = Map.empty): Unit =
    formatTrig(quads, prefixes).write.mode("overwrite").text(path)

  private def subjectBlock(s: Term, pos: Seq[(Term, Term)],
                           pfx: Seq[(String, String)]): String = {
    val byPred = pos.groupBy(_._1).toSeq.sortBy(_._1.lex)
    val preds = byPred.map { case (p, objs) =>
      val pTxt = if (p.lex == RDF_TYPE) "a" else term(p, pfx)
      pTxt + " " + objs.map(po => term(po._2, pfx)).mkString(", ")
    }
    term(s, pfx) + " " + preds.mkString(" ;\n    ") + " ."
  }

  /** Compact an IRI against the declared prefixes when the local part is
   * a safe PN_LOCAL (letters/digits/_/-); otherwise full N-Triples form.
   * Literals/bnodes render in their N-Triples form (valid Turtle). */
  private def term(t: Term, pfx: Seq[(String, String)]): String =
    if (t.isIri) {
      pfx.collectFirst {
        case (p, ns) if t.lex.startsWith(ns) &&
          t.lex.substring(ns.length).forall(c =>
            c.isLetterOrDigit || c == '_' || c == '-') &&
          t.lex.length > ns.length =>
          s"$p:${t.lex.substring(ns.length)}"
      }.getOrElse(t.toNTriples)
    } else t.toNTriples
}
