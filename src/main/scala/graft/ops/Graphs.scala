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
}
