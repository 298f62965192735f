package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over a DataFrame edge list — the
 * canonicalization pass that collapses co-referent entities to one IRI
 * (min member, deterministic tie-break).
 *
 * Algorithm: alternating large-star / small-star contractions
 * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
 * — O(log n) rounds on any graph shape (chains, stars, giant components),
 * unlike plain label propagation which needs O(diameter) rounds. Each round
 * is two groupBy shuffles; `localCheckpoint` every round truncates lineage
 * so plans stay O(1) (SURVEY.md §7.3 hard part 5).
 *
 * This is the same iterative-frontier skeleton as SPARQL property-path
 * evaluation (reference ALP algorithm, jena-arq/.../path/eval/PathEngine.java:96–129)
 * — evaluated here with set-at-a-time DataFrame joins instead of per-binding
 * BFS.
 */
object ConnectedComponents {

  /**
   * Size-adaptive entry point: below `localThreshold` edges the component
   * map is computed with a driver-side union-find (one collect of the
   * DEDUPLICATED edge list — sameAs edges are orders of magnitude smaller
   * than the corpus, and a dozen distributed star-contraction rounds on a
   * few-MB edge set is pure scheduler latency); above it, the O(log n)
   * distributed loop. Both produce the identical deterministic map
   * (component = min member under Spark's UTF-8 byte string order),
   * verified against each other in ConnectedComponentsSpec.
   *
   * Sizing: the local path collects ~threshold (src, dst) string pairs —
   * at 2M edges of ~40-char IRIs budget roughly 0.5–1 GB of driver heap;
   * lower the threshold for small-driver deployments.
   */
  def runAdaptive(edges: DataFrame, localThreshold: Long = 2000000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // One materialization of the caller's edge plan (which may be a whole
    // upstream pipeline, e.g. an LSH pair search): persist it, then eagerly
    // checkpoint BOTH derived frames while the cache is live — the returned
    // DataFrame must not re-execute the raw plan on every downstream action
    // (selfLoops lazily referencing it cost one full d4 recompute per
    // evaluation before this).
    val raw = edges.toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val selfLoops = raw.where(col("src") === col("dst"))
        .select(col("src").as("node"), col("src").as("component")).distinct()
        .localCheckpoint(true)
      val e = raw
        .where(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint(true)
      val base =
        if (e.count() <= localThreshold) {
          val pairs = e.as[(String, String)].collect()
          val mapping = graft.fixtures.CorpusGen.connectedComponentsLocal(pairs.toSeq)
          spark.createDataset(mapping.toSeq).toDF("node", "component")
        } else loop(e)
      padSelfLoops(base, selfLoops)
    } finally raw.unpersist()
  }

  /** Self-loop-ONLY nodes still belong in the map (mapping to themselves);
   * a node with a self-loop AND real edges keeps its component root. */
  private def padSelfLoops(base: DataFrame, selfLoops: DataFrame): DataFrame =
    base.union(selfLoops.join(base, Seq("node"), "left_anti"))

  /** edges: two string columns (src, dst). Returns (node, component) where
   * component = min node id (UTF-8 byte order) of the node's component;
   * every node appearing in edges is present (self-loop-only nodes map to
   * themselves). */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val raw = edges.toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val selfLoops = raw.where(col("src") === col("dst"))
        .select(col("src").as("node"), col("src").as("component")).distinct()
        .localCheckpoint(true)
      val prepared = raw
        .where(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint(true)
      padSelfLoops(loop(prepared, maxIter), selfLoops)
    } finally raw.unpersist()
  }

  /** The star-contraction fixpoint over an already DEDUPED, self-loop-free,
   * checkpointed edge list (runAdaptive calls this directly — its input is
   * already prepared; re-running the distinct would be a wasted full
   * shuffle). Per-round localCheckpoints rely on the ContextCleaner to
   * unpersist dropped rounds as references die; rounds are capped at
   * `maxIter` and the edge set SHRINKS every contraction, which bounds the
   * transient cached footprint. */
  private def loop(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    var e = edges
    var converged = false
    var iter = 0
    var prevSig: Option[(Long, String)] = None
    while (!converged && iter < maxIter) {
      // large-star: for every node u, attach its larger neighbors to
      // m = min(N(u) ∪ {u})
      val und = e.select(col("src").as("u"), col("dst").as("v"))
        .union(e.select(col("dst").as("u"), col("src").as("v")))
      val mins = und.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = und.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()

      // small-star: for every node u, attach its smaller-or-equal neighbors
      // (and u itself) to m = min(N≤(u) ∪ {u})
      val undS = large.select(col("src").as("u"), col("dst").as("v"))
        .union(large.select(col("dst").as("u"), col("src").as("v")))
      val small0 = undS.where(col("v") <= col("u"))
      val minsS = small0.groupBy("u").agg(min(col("v")).as("m"))
      val small = small0.join(minsS, "u")
        .select(col("v").as("src"), col("m").as("dst"))
        .union(minsS.select(col("u").as("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint(true)

      // converged when the edge set is stable. Compare a one-job
      // (count, xxhash64-sum) signature instead of two exceptAll jobs —
      // both sides are distinct sets, so equal count + equal hash sum
      // means equal sets (w.h.p.); at 4N parallelism the two extra
      // exceptAll shuffles per round were pure fixed latency.
      val sigRow = small.agg(
        count(lit(1)).as("n"),
        // decimal(38,0) sum: a long sum of 64-bit hashes overflows ANSI
        coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)).as("h")).head()
      val sig = (sigRow.getLong(0), sigRow.getDecimal(1).toString)
      converged = prevSig.contains(sig)
      prevSig = Some(sig)
      e = small
      iter += 1
    }
    // star contraction halves component diameter per round (O(log n) total);
    // hitting the cap means something is wrong — fail loudly rather than
    // return a partially-contracted (incorrect) component map
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIter rounds")

    // after convergence every edge is (node → component root)
    val roots = e.select(col("dst").as("node"), col("dst").as("component")).distinct()
    e.select(col("src").as("node"), col("dst").as("component"))
      .union(roots)
      .groupBy("node").agg(min("component").as("component"))
  }

  /** Rewrite term columns through the component map: any s/o IRI that is a
   * non-canonical member is replaced by its component representative.
   * The mapping side is left to AQE: it broadcasts when small (the common
   * case — components ≪ triples) and shuffles otherwise. */
  def rewrite(triples: DataFrame, mapping: DataFrame): DataFrame = {
    val m = mapping.toDF("node", "component")
    def swapped(field: String) = when(
      col("component").isNotNull &&
        col(s"$field.kind") === graft.model.Term.KIND_IRI,
      struct(col(s"$field.kind").as("kind"), col("component").as("lex"),
        col(s"$field.dt").as("dt"), col(s"$field.lang").as("lang")))
      .otherwise(col(field))
    val bySubj = triples
      .join(m, col("s.lex") === col("node"), "left_outer")
      .withColumn("s", swapped("s"))
      .drop("node", "component")
    bySubj
      .join(m, col("o.lex") === col("node"), "left_outer")
      .withColumn("o", swapped("o"))
      .drop("node", "component")
  }
}
