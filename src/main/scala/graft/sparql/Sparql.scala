package graft.sparql

import org.apache.spark.sql.DataFrame

import graft.algebra.{Compiler, Construct}

/**
 * Query-facade — the `QueryExecution` surface (reference:
 * sparql/exec/QueryExecDataset.java:172–240): one call per query form over
 * a triple/quad DataFrame with term-struct columns s, p, o (and optional g).
 */
object Sparql {

  /** SELECT → solution DataFrame (one term-struct column per variable). */
  def select(query: String, graph: DataFrame): DataFrame =
    Compiler.compile(Parser.parse(query), graph)

  /** ASK → does at least one solution exist (QueryExecDataset.ask). */
  def ask(query: String, graph: DataFrame): Boolean = Parser.parseAny(query) match {
    case Parser.AskQ(op) => !Compiler.compile(op, graph).isEmpty
    case _ => throw new IllegalArgumentException("not an ASK query")
  }

  /** CONSTRUCT → triple DataFrame (template instantiation + set dedup,
   * QueryExecDataset.java:189–240 → TemplateLib). */
  def construct(query: String, graph: DataFrame): DataFrame =
    Parser.parseAny(query) match {
      case Parser.ConstructQ(template, op) =>
        Construct.construct(template, Compiler.compile(op, graph))
      case _ => throw new IllegalArgumentException("not a CONSTRUCT query")
    }
}
