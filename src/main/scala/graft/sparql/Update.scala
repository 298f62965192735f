package graft.sparql

import org.apache.spark.sql.DataFrame

import graft.algebra.{Compiler, Construct, TriplePattern}
import graft.ops.Graphs

/**
 * SPARQL Update engine over immutable graph DataFrames — the Spark mapping
 * of the reference's `UpdateEngineWorker` (jena-arq/.../sparql/modify/
 * UpdateEngineWorker.java:66 INSERT DATA, :342 DELETE/INSERT WHERE, :370
 * template instantiation via TemplateLib). Where the reference mutates a
 * DatasetGraph in place, every operation here produces a NEW graph
 * DataFrame (the snapshot model of SURVEY.md §2.11/north rule): callers
 * chain updates functionally and commit the result as the next snapshot
 * (e.g. via graft.store.TripleStore).
 *
 * Semantics per SPARQL 1.1 Update:
 *  - a DELETE/INSERT's WHERE is evaluated ONCE against the pre-state;
 *    deletions and insertions both instantiate against those bindings;
 *  - deletions apply before insertions (applyDelta = (G ∖ D) ∪ A);
 *  - INSERT templates may hold blank nodes (fresh per binding, via
 *    Construct's per-row bnode remapping); DELETE templates may not
 *    (raised at parse time);
 *  - graph set semantics throughout (INSERT DATA is idempotent).
 */
object Update {

  def parse(text: String): Seq[Parser.UpdateAst] = Parser.parseUpdate(text)

  /** Apply a (possibly compound, ';'-separated) update request; returns
   * the post-state graph. Operations see each other's effects in order,
   * like the reference's sequential UpdateEngineWorker visit. */
  def run(graph: DataFrame, text: String): DataFrame =
    parse(text).foldLeft(graph.select("s", "p", "o"))(applyOne)

  def applyOne(g: DataFrame, u: Parser.UpdateAst): DataFrame = u match {
    case Parser.UpdateData(true, ts) => Graphs.union(g, constGraph(g, ts))
    case Parser.UpdateData(false, ts) => Graphs.difference(g, constGraph(g, ts))
    case Parser.UpdateModify(del, ins, where) =>
      val sols = Compiler.compile(where, g)
      val removals =
        if (del.nonEmpty) Construct.construct(del, sols) else g.limit(0)
      val additions =
        if (ins.nonEmpty) Construct.construct(ins, sols) else g.limit(0)
      Graphs.applyDelta(g, Graphs.Delta(additions, removals))
    case Parser.UpdateClear => g.limit(0)
  }

  /** Materialize a concrete-triples DATA block as a graph: a template
   * instantiation against a single empty solution row (also gives INSERT
   * DATA's blank nodes one fresh label per request, like the reference's
   * per-request bnode scope). */
  private def constGraph(like: DataFrame, ts: Seq[TriplePattern]): DataFrame = {
    val oneRow = like.sparkSession.range(1).toDF("__one")
    Construct.construct(ts, oneRow)
  }
}
