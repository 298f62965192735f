package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph ops over DataFrame edge lists — the distributed analog of
 * Jena's ALP property-path evaluator (reference:
 * jena-arq/.../path/eval/PathEngine.java:96–129 — BFS with a visited set).
 * Frontier-delta semi-naive iteration: each round joins only the NEW pairs
 * against the edge list, so work is proportional to the delta, not the
 * closure; localCheckpoint truncates lineage per round. */
object Graphs {

  /** Transitive closure of (src, dst): all reachable pairs (SPARQL `p+`). */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val e = edges.toDF("src", "dst").distinct().localCheckpoint(true)
    var acc = e
    var frontier = e
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val next = frontier.alias("f")
        .join(e.alias("e"), col("f.dst") === col("e.src"))
        .select(col("f.src").as("src"), col("e.dst").as("dst"))
        .distinct()
      val delta = next.exceptAll(acc).distinct().localCheckpoint(true)
      if (delta.isEmpty) done = true
      else {
        acc = acc.union(delta).localCheckpoint(true)
        frontier = delta
      }
      iter += 1
    }
    acc
  }

  // ---- graph-level set operations (SURVEY.md §2.7) — the columnar analog
  // of jena-core's compose views (graph/compose/Union.java:37,
  // Intersection.java:37, Difference.java:31, Delta.java:37). The reference
  // composes lazily per-find; ours compose lazily per-DataFrame — Catalyst
  // fuses the set op into downstream plans the same way.

  private def spo(g: DataFrame): DataFrame = g.select("s", "p", "o")

  /** Graph union with set semantics (add is idempotent, TripleStore.java:43). */
  def union(g1: DataFrame, g2: DataFrame): DataFrame =
    spo(g1).union(spo(g2)).dropDuplicates("s", "p", "o")

  def intersection(g1: DataFrame, g2: DataFrame): DataFrame =
    spo(g1).intersect(spo(g2))

  def difference(g1: DataFrame, g2: DataFrame): DataFrame =
    spo(g1).except(spo(g2))

  /** Change-tracking overlay (compose/Delta.java + RDF-Patch shape,
   * SURVEY.md §2.11): a base graph plus add/remove side tables; the north
   * rule's snapshot model applies a Delta as the next immutable snapshot. */
  final case class Delta(additions: DataFrame, removals: DataFrame)

  def applyDelta(base: DataFrame, delta: Delta): DataFrame =
    union(difference(base, delta.removals), delta.additions)
}
