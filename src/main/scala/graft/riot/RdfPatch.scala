package graft.riot

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Term

/**
 * RDF-Patch text format (reference: jena-rdfpatch
 * RDFPatchReaderText.java / TextWriter.java; testing/files/syntax-1.rdfp).
 * One op per line, terms in N-Triples syntax (incl. RDF 1.2 triple
 * terms), '.' terminated:
 *
 *   H  name  value .             header (id, prev, …)
 *   TX . / TC . / TA .           transaction begin / commit / abort
 *   PA "pfx" <iri> [g] .         prefix add (optionally per graph)
 *   PD "pfx" [g] .               prefix delete
 *   A  s p o [g] .               add triple/quad
 *   D  s p o [g] .               delete triple/quad
 *
 * `read`/`write` round-trip by value; `toChangeRows` feeds the streaming
 * snapshot chain (`StreamIngest.applyPatchStream`).
 */
object RdfPatch {

  sealed trait Op
  final case class Header(field: String, value: Term) extends Op
  case object TxnBegin extends Op
  case object TxnCommit extends Op
  case object TxnAbort extends Op
  /** segment marker `PB .` separates patch bundles (rarely used). */
  case object Segment extends Op
  final case class PrefixAdd(prefix: String, iri: String, graph: Option[Term]) extends Op
  final case class PrefixDelete(prefix: String, graph: Option[Term]) extends Op
  final case class Add(s: Term, p: Term, o: Term, g: Option[Term]) extends Op
  final case class Delete(s: Term, p: Term, o: Term, g: Option[Term]) extends Op

  def read(text: String): Seq[Op] = {
    val out = ListBuffer[Op]()
    text.linesIterator.zipWithIndex.foreach { case (raw, ln) =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        def bad(msg: String): Nothing =
          throw new IllegalArgumentException(s"RDF-Patch line ${ln + 1}: $msg")
        val sp = line.indexWhere(c => c == ' ' || c == '\t')
        val code = if (sp < 0) line.stripSuffix(".").trim else line.substring(0, sp)
        val rest = if (sp < 0) "" else line.substring(sp + 1)
        val p = new NTriples.LineParser(rest)
        def opt(): Option[Term] = if (p.peekDot) None else Some(p.term())
        def end(): Unit = if (!p.peekDot) bad("expected '.'")
        code match {
          case "H" =>
            // header field is a bare word, value is a term
            val r = rest.trim
            val sp2 = r.indexWhere(c => c == ' ' || c == '\t')
            if (sp2 < 0) bad("H needs field and value")
            val q = new NTriples.LineParser(r.substring(sp2 + 1))
            out += Header(r.substring(0, sp2), q.term())
          case "TX" => end(); out += TxnBegin
          case "TC" => end(); out += TxnCommit
          case "TA" => end(); out += TxnAbort
          case "PB" => end(); out += Segment
          case "PA" =>
            val pfx = p.term(); val iri = p.term(); val g = opt(); end()
            if (!pfx.isLiteral || !iri.isIri) bad("PA needs \"prefix\" <iri>")
            out += PrefixAdd(pfx.lex, iri.lex, g)
          case "PD" =>
            val pfx = p.term(); val g = opt(); end()
            if (!pfx.isLiteral) bad("PD needs \"prefix\"")
            out += PrefixDelete(pfx.lex, g)
          case "A" =>
            val s = p.term(); val pr = p.term(); val o = p.term(); val g = opt(); end()
            out += Add(s, pr, o, g)
          case "D" =>
            val s = p.term(); val pr = p.term(); val o = p.term(); val g = opt(); end()
            out += Delete(s, pr, o, g)
          case other => bad(s"unknown op '$other'")
        }
      }
    }
    out.toList
  }

  def write(ops: Seq[Op]): String = {
    val sb = new StringBuilder
    def t(x: Term): String = x.toNTriples
    ops.foreach {
      case Header(f, v) => sb.append("H ").append(f).append(' ').append(t(v)).append(" .\n")
      case TxnBegin => sb.append("TX .\n")
      case TxnCommit => sb.append("TC .\n")
      case TxnAbort => sb.append("TA .\n")
      case Segment => sb.append("PB .\n")
      case PrefixAdd(pfx, iri, g) =>
        sb.append("PA ").append(Term.string(pfx).toNTriples).append(' ')
          .append("<").append(iri).append(">")
        g.foreach(x => sb.append(' ').append(t(x)))
        sb.append(" .\n")
      case PrefixDelete(pfx, g) =>
        sb.append("PD ").append(Term.string(pfx).toNTriples)
        g.foreach(x => sb.append(' ').append(t(x)))
        sb.append(" .\n")
      case Add(s, p, o, g) =>
        sb.append("A ").append(t(s)).append(' ').append(t(p)).append(' ').append(t(o))
        g.foreach(x => sb.append(' ').append(t(x)))
        sb.append(" .\n")
      case Delete(s, p, o, g) =>
        sb.append("D ").append(t(s)).append(' ').append(t(p)).append(' ').append(t(o))
        g.foreach(x => sb.append(' ').append(t(x)))
        sb.append(" .\n")
    }
    sb.toString
  }

  /** A/D ops → the (seq, op, s, p, o) change rows `applyPatchStream` folds
   * into snapshots (graph components carried when present). `seq` is the
   * op's position in the patch — RDFPatchOps.applyChanges semantics are
   * SEQUENTIAL, so the last op on a triple decides its membership, and
   * the fold needs the order to honor an A-then-D (or D-then-A) of the
   * same triple inside one batch. */
  def toChangeRows(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val rows = read(text).collect {
      case Add(s, p, o, g) => ("A", s, p, o, g.getOrElse(Term.iri(Term.DEFAULT_GRAPH)))
      case Delete(s, p, o, g) => ("D", s, p, o, g.getOrElse(Term.iri(Term.DEFAULT_GRAPH)))
    }.zipWithIndex.map { case ((op, s, p, o, g), i) => (i.toLong, op, s, p, o, g) }
    rows.toDF("seq", "op", "s", "p", "o", "g")
  }
}
