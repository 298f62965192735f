package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 * Each `queries` entry is one implemented operator family from SURVEY.md §2;
 * `oracleSql` holds the DuckDB-equivalent SQL with identical column names. */
object SparkEntry {
  import graft.queries.Relational

  /** Flagship: the KG-construction pipeline's extraction+agg slice on
   * sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1_agg(spark, "/root/testdata/sf0.001")

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
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(cast(l_quantity as decimal(18,2))) AS sum_qty,
         sum(cast(l_extendedprice as decimal(18,2))) AS sum_price,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1,2""",
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
         cast(l_extendedprice as decimal(18,2)) AS price
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount >= 0.05""",
    "q3_join_agg" ->
      """SELECT n_name,
         sum(cast(l_extendedprice as decimal(18,2))) AS revenue,
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
      """SELECT o_orderkey, cast(o_totalprice as decimal(18,2)) AS totalprice
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
         cast(round(cast(l_extendedprice as decimal(18,2))
                    * (1 - cast(l_discount as decimal(18,4))), 2)
              as decimal(18,2)) AS disc_price
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
         cast(o_totalprice as decimal(18,2)) AS totalprice
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
         WHERE rn = 1""",
  )
}
