package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 * Each `queries` entry is one implemented operator family from SURVEY.md §2;
 * `oracleSql` holds the DuckDB-equivalent SQL with identical column names. */
object SparkEntry {
  import graft.queries.{OpsQueries, Relational, SparqlQueries}

  /** Flagship: the full SPARQL stack — text parse → algebra → Catalyst —
   * over the triple encoding of the sf0.001 tables; driver smoke-checks
   * rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SparqlQueries.r22_sparql_text(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> Relational.q1_agg _,
    "q2_filter_project" -> Relational.q2_filter_project _,
    "q3_join_agg"       -> Relational.q3_join_agg _,
    "q4_leftjoin"       -> Relational.q4_leftjoin _,
    "q5_semijoin"       -> Relational.q5_semijoin _,
    "q6_antijoin"       -> Relational.q6_antijoin _,
    "q7_union"          -> Relational.q7_union _,
    "q8_distinct"       -> Relational.q8_distinct _,
    "q9_topk"           -> Relational.q9_topk _,
    "q10_minus"         -> Relational.q10_minus _,
    "q11_values"        -> Relational.q11_values _,
    "q12_extend"        -> Relational.q12_extend _,
    "q13_explode"       -> Relational.q13_explode _,
    "q14_groupconcat"   -> Relational.q14_groupconcat _,
    "q15_window"        -> Relational.q15_window _,
    // training-data ops (SURVEY §2 + pipeline additions)
    "d1_dedup_exact"    -> OpsQueries.d1_dedup_exact _,
    "d2_dedup_ngram"    -> OpsQueries.d2_dedup_ngram _,
    "d3_minhash_sig"    -> OpsQueries.d3_minhash_sig _,
    "d4_dedup_lsh"      -> OpsQueries.d4_dedup_lsh _,
    "d5_simhash"        -> OpsQueries.d5_simhash _,
    "d6_simhash_pairs"  -> OpsQueries.d6_simhash_pairs _,
    "d7_simhash_lsh"    -> OpsQueries.d7_simhash_lsh _,
    "s1_ann_topk"       -> OpsQueries.s1_ann_topk _,
    "s2_ann_lsh"        -> OpsQueries.s2_ann_lsh _,
    "s3_ann_ivf"        -> OpsQueries.s3_ann_ivf _,
    "e1_embed_pairs"    -> OpsQueries.e1_embed_pairs _,
    "t1_text_stats"     -> OpsQueries.t1_text_stats _,
    "t2_lang_id"        -> OpsQueries.t2_lang_id _,
    "t3_fingerprint"    -> OpsQueries.t3_fingerprint _,
    "t4_rolling_fp"     -> OpsQueries.t4_rolling_fingerprint _,
    "t5_token_count"    -> OpsQueries.t5_token_count _,
    "t6_decontam"       -> OpsQueries.t6_decontam _,
    "t7_repetition"     -> OpsQueries.t7_repetition _,
    "t8_pii_scrub"      -> OpsQueries.t8_pii_scrub _,
    "t9_text_query"     -> OpsQueries.t9_text_query _,
    "t10_text_fuzzy"    -> OpsQueries.t10_text_fuzzy _,
    "t11_text_indexed"  -> OpsQueries.t11_text_indexed _,
    "d8_dedup_clusters" -> OpsQueries.d8_dedup_clusters _,
    "c1_corpus_filter"  -> OpsQueries.c1_corpus_filter _,
    "c2_pack_sequences" -> OpsQueries.c2_pack_sequences _,
    "c3_sample_mix"     -> OpsQueries.c3_sample_mix _,
    "c4_split_groups"   -> OpsQueries.c4_split_groups _,
    "c5_shuffle_shards" -> OpsQueries.c5_shuffle_shards _,
    "g1_path_closure"   -> OpsQueries.g1_path_closure _,
    "x1_geo_radius"     -> OpsQueries.x1_geo_radius _,
    "x2_geo_within"     -> OpsQueries.x2_geo_within _,
    "x3_geo_intersects" -> OpsQueries.x3_geo_intersects _,
    "v4_cdt_fold"       -> OpsQueries.v4_cdt_fold _,
    // SPARQL algebra over a triple encoding (graft.algebra Compiler)
    "r16_bgp"             -> SparqlQueries.r16_bgp _,
    "r17_optional_group"  -> SparqlQueries.r17_optional_group _,
    "r18_minus"           -> SparqlQueries.r18_minus _,
    "r19_path_seq"        -> SparqlQueries.r19_path_seq _,
    "r20_union_order_slice" -> SparqlQueries.r20_union_order_slice _,
    "r21_exists_filter"   -> SparqlQueries.r21_exists_filter _,
    "r22_sparql_text"     -> SparqlQueries.r22_sparql_text _,
    "u1_update"           -> SparqlQueries.u1_update _,
    "r23_graph_quads"     -> SparqlQueries.r23_graph_quads _,
    "r24_path_mod"        -> SparqlQueries.r24_path_mod _,
    "r27_encoded_path"    -> SparqlQueries.r27_encoded_path _,
    "r28_seeded_path"     -> SparqlQueries.r28_seeded_path _,
    "r25_encoded_bgp"     -> SparqlQueries.r25_encoded_bgp _,
    "r26_tz_adjust"       -> SparqlQueries.r26_tz_adjust _,
    "v1_shacl"            -> graft.queries.ShaclQueries.v1_shacl _,
    "v2_rules"            -> graft.queries.ReasonQueries.v2_rules _,
    "v5_lp_goal"          -> graft.queries.ReasonQueries.v5_lp_goal _,
    "v6_magic_goal"       -> graft.queries.ReasonQueries.v6_magic_goal _,
    "v7_owl_micro"        -> graft.queries.ReasonQueries.v7_owl_micro _,
    "v8_sameas_canon"     -> graft.queries.ReasonQueries.v8_sameas_canon _,
    "v3_shex"             -> graft.queries.ShexQueries.v3_shex _,
    "m1_media_meta"     -> ((s, d) => graft.ops.Multimodal.extractMeta(
      graft.ops.Multimodal.asMedia(graft.Tables.documents(s, d))).toDF()),
    // real javax.imageio decode over deterministically generated PNGs —
    // the oracle predicts the dimensions the decoder must read back
    "m2_image_decode"   -> ((s, d) => graft.ops.Multimodal.extractMeta(
      graft.ops.Multimodal.syntheticImages(graft.Tables.documents(s, d)))
      .toDF().select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("width"),
        org.apache.spark.sql.functions.col("height"),
        org.apache.spark.sql.functions.col("channels"))),
  )

  /** d4's full DuckDB pipeline SQL — the "d4_dedup_lsh" oracle, and reused
   * verbatim as d8's pair source so the two gates can never drift. */
  private lazy val d4Sql: String =
    s"""WITH docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000 AS doc_id,
                  substr(text, instr(text, ' ') + 1) AS text FROM documents),
         sh AS (
           SELECT doc_id, list_transform(list_distinct(list_transform(
             range(1, len(string_split(text, ' '))),
             j -> string_split(text, ' ')[j] || '_' || string_split(text, ' ')[j+1])),
             s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))
             AS shingles
           FROM docs),
         sig AS (
           SELECT doc_id, shingles,
             (${graft.queries.OpsQueries.mhSigSqlDuckPrehashed("shingles")}) AS mh
           FROM sh),
         banded AS (
           SELECT doc_id, shingles, b AS band,
                  mh[CAST(2*b+1 AS INT)] || '_' || mh[CAST(2*b+2 AS INT)] AS bucket
           FROM sig, range(0, 4) t(b)),
         capped AS (
           SELECT * FROM banded
           QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 64),
         cand AS (
           SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id,
                  l.shingles AS a_sh, r.shingles AS b_sh
           FROM capped l JOIN capped r
             ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)
         SELECT DISTINCT a_id, b_id,
           (1000 * len(list_intersect(a_sh, b_sh)))
             // (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh))) AS jac_permille
         FROM cand
         WHERE (1000 * len(list_intersect(a_sh, b_sh)))
             // (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh))) >= 500"""

  def oracleSql: Map[String, String] = SparqlQueries.oracle ++
    graft.queries.ShaclQueries.oracle ++ graft.queries.ReasonQueries.oracle ++
    graft.queries.ShexQueries.oracle ++ Map(
    // money columns: integer-cents arithmetic (floor(x*100+0.5)) — the only
    // double→fixed-point path that is bit-identical in Spark and DuckDB
    // (see graft.queries.Relational header note)
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1,2""",
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS price
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount >= 0.05""",
    "q3_join_agg" ->
      """SELECT n_name,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
         count(*) AS n_items
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1""",
    "q4_leftjoin" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1""",
    "q5_semijoin" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_suppkey = s_suppkey AND l_quantity > 45)""",
    "q6_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q7_union" ->
      """SELECT DISTINCT * FROM (
           SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
           UNION ALL
           SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier)""",
    "q8_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q9_topk" ->
      """SELECT o_orderkey,
         CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q10_minus" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)""",
    "q11_values" ->
      """SELECT seg, segrank, count(*) AS n
         FROM customer
         JOIN (VALUES ('BUILDING', 1), ('MACHINERY', 2)) AS v(seg, segrank)
           ON c_mktsegment = seg
         GROUP BY 1,2""",
    "q12_extend" ->
      """SELECT l_orderkey,
         CAST(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
              AS DOUBLE) / 100.0 AS disc_price
         FROM lineitem WHERE l_linenumber = 1""",
    "q13_explode" ->
      """SELECT type_word, count(*) AS n FROM (
           SELECT unnest(string_split(p_type, ' ')) AS type_word FROM part)
         GROUP BY 1""",
    "q14_groupconcat" ->
      """SELECT n_regionkey,
         string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation GROUP BY 1""",
    "q15_window" ->
      """SELECT o_custkey, o_orderkey,
         CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS totalprice
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
         WHERE rn = 1""",
    "d1_dedup_exact" ->
      """WITH all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents)
         SELECT doc_id,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canon_id,
           CASE WHEN doc_id != min(doc_id) OVER (PARTITION BY md5(text))
                THEN 1 ELSE 0 END AS is_dup
         FROM all_docs""",
    "d2_dedup_ngram" ->
      """WITH g AS (
           SELECT doc_id, list_distinct(list_transform(range(1, length(text)-1),
             i -> substr(text, CAST(i AS INT), 3))) AS grams
           FROM documents WHERE doc_id < 200)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           (1000 * len(list_intersect(a.grams, b.grams)))
             // (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
             AS jac_permille
         FROM g a JOIN g b ON a.doc_id < b.doc_id
         WHERE (1000 * len(list_intersect(a.grams, b.grams)))
             // (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 700""",
    "d3_minhash_sig" ->
      s"""WITH sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, len(string_split(text, ' '))),
             j -> string_split(text, ' ')[j] || '_' || string_split(text, ' ')[j+1]))
             AS shingles
           FROM documents)
         SELECT doc_id, CAST(i AS INT) AS h_idx,
           (${graft.queries.OpsQueries.mhSigSqlDuck("shingles")})[CAST(i+1 AS INT)] AS minhash
         FROM sh, range(0, 8) t(i)""",
    "d4_dedup_lsh" -> d4Sql,
    // d8: d4's pair list verbatim as the edge set, then min-id reachability
    // closure (recursive CTE) == connected components; singletons (no edge)
    // keep themselves via the LEFT JOIN + coalesce
    "d8_dedup_clusters" ->
      s"""WITH RECURSIVE
         pairs AS (SELECT a_id, b_id FROM ($d4Sql)),
         ids AS (SELECT doc_id FROM documents
                 UNION ALL SELECT doc_id + 100000 FROM documents),
         es AS (SELECT a_id AS u, b_id AS v FROM pairs
                UNION SELECT b_id AS u, a_id AS v FROM pairs),
         reach(u, v) AS (
           SELECT u, v FROM es
           UNION
           SELECT r.u, e.v FROM reach r JOIN es e ON r.v = e.u)
         SELECT i.doc_id,
           least(i.doc_id, coalesce(min(r.v), i.doc_id)) AS canon_id,
           CAST(CASE WHEN least(i.doc_id, coalesce(min(r.v), i.doc_id))
                          = i.doc_id
                THEN 1 ELSE 0 END AS BIGINT) AS keep
         FROM ids i LEFT JOIN reach r ON r.u = i.doc_id
         GROUP BY i.doc_id""",
    "d5_simhash" ->
      """WITH h AS (
           SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')),
             t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
           FROM documents)
         SELECT doc_id,
           list_aggregate(list_transform(range(0, 60), j ->
             CASE WHEN list_aggregate(list_transform(hs,
                    h2 -> CASE WHEN (h2 >> j) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0
                  THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END),
             'sum')::BIGINT AS simhash
         FROM h""",
    "d6_simhash_pairs" ->
      """WITH h AS (
           SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')),
             t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
           FROM documents WHERE doc_id < 200),
         s AS (
           SELECT doc_id,
             list_aggregate(list_transform(range(0, 60), j ->
               CASE WHEN list_aggregate(list_transform(hs,
                      h2 -> CASE WHEN (h2 >> j) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0
                    THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END),
               'sum')::BIGINT AS simhash
           FROM h)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                bit_count(xor(a.simhash, b.simhash)) AS hamming
         FROM s a JOIN s b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 18""",
    // d7 banding is COMPLETE for hamming ≤ 5 (6 segments, pigeonhole) —
    // except where the per-(band,seg) > 64-member cap drops a degenerate
    // segment; the oracle mirrors the banded join + cap exactly
    "d7_simhash_lsh" ->
      """WITH docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000 AS doc_id,
                  substr(text, instr(text, ' ') + 1) AS text FROM documents),
         h AS (
           SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')),
             t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
           FROM docs),
         s AS (
           SELECT doc_id,
             list_aggregate(list_transform(range(0, 60), j ->
               CASE WHEN list_aggregate(list_transform(hs,
                      h2 -> CASE WHEN (h2 >> j) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0
                    THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END),
               'sum')::BIGINT AS simhash
           FROM h),
         reps AS (
           SELECT simhash, min(doc_id) AS rep_id FROM s GROUP BY 1),
         banded AS (
           SELECT rep_id, simhash, b AS band,
                  (simhash >> CAST(b * 10 AS INT)) & 1023 AS seg
           FROM reps, range(0, 6) t(b)),
         capped AS (
           SELECT * FROM banded
           QUALIFY count(*) OVER (PARTITION BY band, seg) <= 64)
         SELECT DISTINCT a.rep_id AS a_id, b.rep_id AS b_id,
                bit_count(xor(a.simhash, b.simhash)) AS hamming
         FROM capped a JOIN capped b
           ON a.band = b.band AND a.seg = b.seg AND a.rep_id < b.rep_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 5""",
    "s2_ann_lsh" -> graft.queries.OpsQueries.s2SqlDuck,
    "s1_ann_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         p AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_aggregate(list_transform(range(1, 65),
               i -> q.v[CAST(i AS INT)] * c.v[CAST(i AS INT)]), 'sum')
             / (sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> q.v[CAST(i AS INT)] * q.v[CAST(i AS INT)]), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> c.v[CAST(i AS INT)] * c.v[CAST(i AS INT)]), 'sum'))) AS sim
           FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id != c.vec_id)
         SELECT query_id, neighbor_id, rk, round(sim, 4) AS sim4
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY sim DESC, neighbor_id) AS rk FROM p)
         WHERE rk <= 5""",
    "s3_ann_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         c AS (SELECT CAST(vec_id // 37 AS INT) AS cell, v AS cv
               FROM e WHERE vec_id % 37 = 0 AND vec_id < 296),
         sims AS (
           SELECT e.vec_id, e.v, c.cell,
             list_aggregate(list_transform(range(1, 65),
               i -> e.v[CAST(i AS INT)] * c.cv[CAST(i AS INT)]), 'sum')
             / (sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> e.v[CAST(i AS INT)] * e.v[CAST(i AS INT)]), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> c.cv[CAST(i AS INT)] * c.cv[CAST(i AS INT)]), 'sum'))) AS csim
           FROM e CROSS JOIN c),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cell) AS crk FROM sims),
         corpus AS (SELECT vec_id AS neighbor_id, v AS nv, cell
                    FROM ranked WHERE crk = 1),
         queries AS (SELECT vec_id AS query_id, v AS qv, cell
                     FROM ranked WHERE crk <= 2 AND vec_id < 10),
         p AS (
           SELECT q.query_id, s.neighbor_id,
             list_aggregate(list_transform(range(1, 65),
               i -> q.qv[CAST(i AS INT)] * s.nv[CAST(i AS INT)]), 'sum')
             / (sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> q.qv[CAST(i AS INT)] * q.qv[CAST(i AS INT)]), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> s.nv[CAST(i AS INT)] * s.nv[CAST(i AS INT)]), 'sum'))) AS sim
           FROM queries q JOIN corpus s USING (cell)
           WHERE q.query_id != s.neighbor_id)
         SELECT query_id, neighbor_id, rk, round(sim, 4) AS sim4
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY sim DESC, neighbor_id) AS rk FROM p)
         WHERE rk <= 5""",
    "e1_embed_pairs" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings WHERE vec_id < 300),
         p AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             list_aggregate(list_transform(range(1, 65),
               i -> a.v[CAST(i AS INT)] * b.v[CAST(i AS INT)]), 'sum')
             / (sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> a.v[CAST(i AS INT)] * a.v[CAST(i AS INT)]), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> b.v[CAST(i AS INT)] * b.v[CAST(i AS INT)]), 'sum'))) AS sim
           FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT a_id, b_id, round(sim, 4) AS sim4 FROM p WHERE sim >= 0.35""",
    "t1_text_stats" ->
      """SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
           CAST(list_aggregate(list_transform(string_split(text, ' '),
             t -> CAST(length(t) AS BIGINT)), 'sum') AS BIGINT) AS token_chars,
           (1000 * len(list_distinct(string_split(text, ' '))))
             // len(string_split(text, ' ')) AS distinct_permille,
           (1000 * len(list_filter(string_split(text, ' '),
             t -> t IN ('the', 'a', 'of', 'and'))))
             // len(string_split(text, ' ')) AS stopword_permille
         FROM documents""",
    "t2_lang_id" ->
      """WITH sc AS (
           SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('der','die','das','und','ist','nicht'))) AS BIGINT) AS score_de,
             CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','of','and','is','to'))) AS BIGINT) AS score_en,
             CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('el','los','las','y','es','que'))) AS BIGINT) AS score_es,
             CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('le','les','et','est','dans','une'))) AS BIGINT) AS score_fr
           FROM documents)
         SELECT doc_id, score_de, score_en, score_es, score_fr,
           CASE
             WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
             WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
             WHEN score_es >= score_fr THEN 'es'
             ELSE 'fr' END AS lang_pred
         FROM sc""",
    "t6_decontam" ->
      """WITH aug AS (
           SELECT doc_id, text FROM documents WHERE doc_id >= 50
           UNION ALL
           SELECT doc_id + 100000, substr(text, instr(text, ' ') + 1) FROM documents),
         g AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(string_split(text, ' ')) >= 8 THEN
               list_transform(range(1, len(string_split(text, ' ')) - 6),
                 j -> array_to_string(string_split(text, ' ')[j:j+7], '_'))
               ELSE [] END) AS grams
           FROM aug),
         bg AS (
           SELECT DISTINCT unnest(list_distinct(CASE WHEN len(string_split(text, ' ')) >= 8 THEN
               list_transform(range(1, len(string_split(text, ' ')) - 6),
                 j -> array_to_string(string_split(text, ' ')[j:j+7], '_'))
               ELSE [] END)) AS gram
           FROM documents WHERE doc_id < 50),
         c AS (SELECT doc_id, len(grams) AS n_total, unnest(grams) AS gram FROM g)
         SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_overlap,
           (1000 * CAST(count(*) AS BIGINT)) // any_value(c.n_total) AS overlap_permille
         FROM c JOIN bg ON c.gram = bg.gram
         GROUP BY c.doc_id""",
    "t3_fingerprint" ->
      """SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fingerprint
         FROM documents""",
    "t4_rolling_fp" ->
      """SELECT doc_id,
           list_reduce(list_concat([CAST(0 AS BIGINT)],
             list_transform(string_split(text, ' '),
               t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT))),
             (acc, h) -> (acc * 31 + h) % 2147483647) AS rolling_fp
         FROM documents""",
    "t5_token_count" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
                AS BIGINT) AS bpe_tokens
         FROM documents""",
    "t7_repetition" ->
      """WITH base AS (
           SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         stats AS (
           SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
             list_transform(range(1, len(ws)),
               j -> ws[j] || '_' || ws[j+1]) AS bgs
           FROM base),
         bg AS (SELECT doc_id, unnest(bgs) AS b FROM stats),
         bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
         top AS (
           SELECT doc_id, CAST(max(c) AS BIGINT) AS mx,
                  CAST(sum(c) AS BIGINT) AS tot
           FROM bgc GROUP BY 1)
         SELECT s.doc_id, n_words, n_distinct,
           ((n_words - n_distinct) * 1000) // n_words AS dup_word_permille,
           (mx * 1000) // tot AS top_bigram_permille
         FROM stats s JOIN top USING (doc_id)""",
    "c1_corpus_filter" ->
      """WITH aug AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com for details'
                  ELSE text END AS t
           FROM documents),
         sig AS (
           SELECT doc_id,
             CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(t, ' '))) AS BIGINT)
               AS n_distinct,
             (1000 * CAST(len(list_filter(string_split(t, ' '),
                w -> w IN ('the', 'a', 'of', 'and'))) AS BIGINT))
               // CAST(len(string_split(t, ' ')) AS BIGINT)
               AS stopword_permille,
             CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS BIGINT)
               AS n_emails
           FROM aug),
         ruled AS (
           SELECT doc_id, n_tokens,
             ((n_tokens - n_distinct) * 1000) // n_tokens AS dup_word_permille,
             CASE WHEN n_tokens < 20 THEN 'too_short'
                  WHEN n_tokens > 5000 THEN 'too_long'
                  WHEN n_emails > 0 THEN 'pii'
                  WHEN ((n_tokens - n_distinct) * 1000) // n_tokens > 700
                    THEN 'repetitive'
                  WHEN stopword_permille < 10 THEN 'low_quality'
                  ELSE '' END AS reason
           FROM sig)
         SELECT doc_id,
           CAST(CASE WHEN reason = '' THEN 1 ELSE 0 END AS BIGINT) AS keep,
           reason, n_tokens, dup_word_permille
         FROM ruled""",
    "c2_pack_sequences" ->
      """WITH t AS (
           SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text,
               '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT *, sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
           FROM t WHERE n_tokens > 0)
         SELECT doc_id, lang, n_tokens,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_first,
           CAST((cum - 1) // 2048 AS BIGINT) AS pack_last,
           CAST(((cum - 1) // 2048) - ((cum - n_tokens) // 2048) + 1
                AS BIGINT) AS pack_n
         FROM c""",
    "c3_sample_mix" ->
      """WITH t AS (
           SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|mix1'),
                   1, 15)) AS BIGINT) % 1000000 AS draw,
             CASE WHEN lang = 'en' THEN 500000
                  WHEN lang = 'zh' THEN 800000
                  ELSE 250000 END AS rate_ppm
           FROM documents)
         SELECT doc_id, lang, CAST(draw AS BIGINT) AS draw
         FROM t WHERE draw < rate_ppm""",
    "c4_split_groups" ->
      """SELECT doc_id, source,
           CASE WHEN b < 8000 THEN 'train'
                WHEN b < 9000 THEN 'valid'
                ELSE 'test' END AS split
         FROM (SELECT doc_id, source,
                 CAST(('0x' || substr(md5(source || '|split1'), 1, 15))
                   AS BIGINT) % 10000 AS b
               FROM documents)""",
    "c5_shuffle_shards" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|shuf1'),
                   1, 15)) AS BIGINT) AS draw
           FROM documents)
         SELECT doc_id, draw % 64 AS shard,
           CAST(row_number() OVER (PARTITION BY draw % 64
                                   ORDER BY draw, doc_id) AS BIGINT) AS pos
         FROM t""",
    "t9_text_query" ->
      """SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS doc,
           CAST(len(list_intersect(
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')),
             ['spark', 'vector'])) AS BIGINT) AS score
         FROM documents
         WHERE len(list_intersect(
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')),
             ['spark', 'vector'])) > 0""",
    "t11_text_indexed" ->
      """SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS doc,
           CAST(len(list_intersect(
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')),
             ['spark', 'vector'])) AS BIGINT) AS score
         FROM documents
         WHERE len(list_intersect(
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')),
             ['spark', 'vector'])) > 0""",
    "t10_text_fuzzy" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_distinct(
             regexp_extract_all(lower(text), '[a-z0-9]+'))) AS token
           FROM documents),
         hit AS (
           SELECT DISTINCT doc_id FROM toks
           WHERE levenshtein(token, 'vactor') <= 1),
         ex AS (SELECT DISTINCT doc_id FROM toks WHERE token = 'spark')
         SELECT 'urn:doc:' || CAST(doc_id AS VARCHAR) AS doc,
                CAST(1 AS BIGINT) AS score
         FROM hit WHERE doc_id NOT IN (SELECT doc_id FROM ex)""",
    "t8_pii_scrub" ->
      """WITH aug AS (
           SELECT doc_id,
             CASE WHEN doc_id % 13 = 0
                  THEN base || ' escalate to ops-' || CAST(doc_id AS VARCHAR)
                            || '@internal.example.org asap'
                  ELSE base END AS t
           FROM (SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                                  || '@example.com for details'
                        ELSE text END AS base
                 FROM documents))
         SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           md5(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '<EMAIL>', 'g'))
             AS redacted_md5
         FROM aug""",
    "g1_path_closure" ->
      """WITH RECURSIVE e AS (
           SELECT DISTINCT user_id % 50 AS src, (user_id * 7 + 3) % 50 AS dst
           FROM events WHERE user_id % 50 != (user_id * 7 + 3) % 50),
         reach(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src)
         SELECT src, dst FROM reach""",
    // planar-degree radius predicate: pure +,*,/ on identically-derived
    // doubles — bit-identical in Spark and DuckDB (no libm calls)
    "x1_geo_radius" ->
      """WITH pts AS (
           SELECT CAST(c_custkey AS BIGINT) AS id,
                  CAST(('0x' || substr(md5(c_custkey || 'lat'), 1, 15)) AS BIGINT)
                    % 1800 / 10.0 - 90.0 AS lat,
                  CAST(('0x' || substr(md5(c_custkey || 'lon'), 1, 15)) AS BIGINT)
                    % 3600 / 10.0 - 180.0 AS lon
           FROM customer)
         SELECT p.id AS a, q.id AS b
         FROM pts p JOIN pts q ON p.id < q.id
         WHERE (p.lat - q.lat) * (p.lat - q.lat)
             + (p.lon - q.lon) * (p.lon - q.lon) <= 9.0""",
    "x2_geo_within" ->
      """WITH pts AS (
           SELECT CAST(c_custkey AS BIGINT) AS id,
                  CAST(('0x' || substr(md5(c_custkey || 'lat'), 1, 15)) AS BIGINT)
                    % 1800 / 10.0 - 90.0 AS lat,
                  CAST(('0x' || substr(md5(c_custkey || 'lon'), 1, 15)) AS BIGINT)
                    % 3600 / 10.0 - 180.0 AS lon
           FROM customer),
         e(ax, ay, bx, by) AS (VALUES
           (0, 0, 60, 0), (60, 0, 60, 30), (60, 30, 30, 30),
           (30, 30, 30, 60), (30, 60, 0, 60), (0, 60, 0, 0))
         SELECT p.id
         FROM pts p
         WHERE p.lon >= 0 AND p.lon <= 60 AND p.lat >= 0 AND p.lat <= 60
           AND (SELECT count(*) FROM e
                 WHERE ((e.ay > p.lat) != (e.by > p.lat))
                   AND p.lon < e.ax + (e.bx - e.ax) * (p.lat - e.ay)
                                      / (e.by - e.ay)) % 2 = 1""",
    "x3_geo_intersects" ->
      """WITH pts AS (
           SELECT CAST(c_custkey AS BIGINT) AS id,
                  CAST(('0x' || substr(md5(c_custkey || 'lat'), 1, 15)) AS BIGINT)
                    % 1800 / 10.0 - 90.0 AS ay,
                  CAST(('0x' || substr(md5(c_custkey || 'lon'), 1, 15)) AS BIGINT)
                    % 3600 / 10.0 - 180.0 AS ax,
                  CAST(('0x' || substr(md5(c_custkey || 'dlat'), 1, 15)) AS BIGINT)
                    % 400 / 10.0 - 20.0 AS dy,
                  CAST(('0x' || substr(md5(c_custkey || 'dlon'), 1, 15)) AS BIGINT)
                    % 400 / 10.0 - 20.0 AS dx
           FROM customer),
         seg AS (SELECT id, ax, ay, ax + dx AS bx, ay + dy AS by FROM pts),
         e(ex1, ey1, ex2, ey2) AS (VALUES
           (0, 0, 60, 0), (60, 0, 60, 30), (60, 30, 30, 30),
           (30, 30, 30, 60), (30, 60, 0, 60), (0, 60, 0, 0))
         SELECT s.id FROM seg s
         WHERE (s.ax >= 0 AND s.ax <= 60 AND s.ay >= 0 AND s.ay <= 60
                AND (SELECT count(*) FROM e
                      WHERE ((e.ey1 > s.ay) != (e.ey2 > s.ay))
                        AND s.ax < e.ex1 + (e.ex2 - e.ex1) * (s.ay - e.ey1)
                                           / (e.ey2 - e.ey1)) % 2 = 1)
            OR (s.bx >= 0 AND s.bx <= 60 AND s.by >= 0 AND s.by <= 60
                AND (SELECT count(*) FROM e
                      WHERE ((e.ey1 > s.by) != (e.ey2 > s.by))
                        AND s.bx < e.ex1 + (e.ex2 - e.ex1) * (s.by - e.ey1)
                                           / (e.ey2 - e.ey1)) % 2 = 1)
            OR EXISTS (SELECT 1 FROM e
                 WHERE ((s.bx - s.ax) * (e.ey1 - s.ay) - (s.by - s.ay) * (e.ex1 - s.ax))
                     * ((s.bx - s.ax) * (e.ey2 - s.ay) - (s.by - s.ay) * (e.ex2 - s.ax)) < 0
                   AND ((e.ex2 - e.ex1) * (s.ay - e.ey1) - (e.ey2 - e.ey1) * (s.ax - e.ex1))
                     * ((e.ex2 - e.ex1) * (s.by - e.ey1) - (e.ey2 - e.ey1) * (s.bx - e.ex1)) < 0)""",
    "v4_cdt_fold" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
                '[' || string_agg(DISTINCT '"' || c_mktsegment || '"', ', '
                        ORDER BY '"' || c_mktsegment || '"') || ']' AS segments
         FROM customer GROUP BY 1""",
    "m1_media_meta" ->
      """SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(16 + (length(text) % 640) AS INT) AS width,
           CAST(16 + ((length(text) * 7) % 480) AS INT) AS height,
           CAST(1 + (length(text) % 3) AS INT) AS channels,
           list_reduce(list_concat([CAST(0 AS BIGINT)],
             list_transform(range(1, least(length(text), 8) + 1),
               i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
             (a, b) -> a * 31 + b) AS checksum
         FROM documents""",
    "m2_image_decode" ->
      """SELECT doc_id,
           CAST(8 + doc_id % 32 AS INT) AS width,
           CAST(8 + (doc_id * 3) % 32 AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT) AS channels
         FROM documents""",
  )
}
