package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Relational coverage queries — one per SPARQL-algebra operator family from
 * SURVEY.md §2, expressed Spark-first over the driver test tables. Each has a
 * DuckDB oracle (SparkEntry.oracleSql) with identical column names/types.
 *
 * Scale notes (the plans these compile to):
 *  - dimension tables (region/nation, VALUES tables) are broadcast — no shuffle;
 *  - fact-fact joins shuffle on their equi-keys once, AQE handles skew;
 *  - aggregates are partial+final hash aggregates (map-side combine);
 *  - money/quantity values go through integer cents (floor(x*100+0.5)) so
 *    sums are order-independent and bit-exact vs the oracle: multiply/add/
 *    floor are pure IEEE ops identical in Spark and DuckDB, whereas the
 *    double→decimal cast is NOT (Spark rounds the shortest decimal string
 *    via BigDecimal.valueOf, DuckDB rounds the exact binary value — x.xx5
 *    boundaries diverge by one cent).
 */
object Relational {

  /** double → exact integer cents; deterministic + portable (see above). */
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")
  /** integer cents → presentable double; exact for |cents| < 2^53. */
  private def money(c: Column): Column = c.cast("double") / 100.0

  /** OpGroup (§2.4): partial+final hash aggregation, no shuffle beyond the
   * groupBy keys; decimal sums are associative → map-side combine is exact. */
  def q1_agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(cents(col("l_quantity")))).as("sum_qty"),
        money(sum(cents(col("l_extendedprice")))).as("sum_price"),
        count(lit(1)).as("n_rows"))

  /** OpFilter + OpProject (§2.2): both reach the parquet scan
   * (PushedFilters + pruned ReadSchema). */
  def q2_filter_project(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"),
        money(cents(col("l_extendedprice"))).as("price"))

  /** OpJoin / OpSequence / BGP chain (§2.3): two fact joins shuffle on the
   * key; nation is broadcast (no shuffle for the dim). */
  def q3_join_agg(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("n_name"))
      .agg(money(sum(cents(col("l_extendedprice")))).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  /** OPTIONAL / left join (§2.3): unmatched left rows survive with NULLs,
   * then aggregate. */
  def q4_leftjoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           count(lit(1)).as("n_rows"))
  }

  /** EXISTS / OpSemiJoin (§2.3): left_semi — no right columns materialize,
   * probe side streams. */
  def q5_semijoin(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
    val l = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
    sup.join(l, sup("s_suppkey") === l("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }

  /** NOT EXISTS / OpAntiJoin (§2.3). */
  def q6_antijoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** UNION / OpUnion+OpDistinct (§2.7): bag union then dedup. */
  def q7_union(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"),
      lit("customer").as("kind"))
    val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"),
      lit("supplier").as("kind"))
    c.union(sup).distinct()
  }

  /** OpDistinct (§2.6): dropDuplicates == SPARQL DISTINCT. */
  def q8_distinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(col("l_returnflag"), col("l_linestatus")).distinct()

  /** OpTopN (§2.6): orderBy+limit fuses to TakeOrderedAndProject — the
   * distributed twin of Jena's bounded PriorityQueue (QueryIterTopN.java:43).
   * o_orderkey is unique ⇒ deterministic. */
  def q9_topk(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), money(cents(col("o_totalprice"))).as("totalprice"))

  /** SPARQL MINUS (§2.3): compatibility-based anti-join over the shared
   * variable domain — here custkey is bound on both sides so it compiles to a
   * plain left_anti (the disjoint-domain subtlety is exercised in the algebra
   * unit tests; see graft.algebra). */
  def q10_minus(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
      .select(col("o_custkey"))
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** VALUES / OpTable (§2.2): inline constant table joined in — broadcast. */
  def q11_values(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vals = s.createDataset(Seq(("BUILDING", 1), ("MACHINERY", 2)))
      .toDF("seg", "segrank")
    Tables.customer(s, d)
      .join(broadcast(vals), col("c_mktsegment") === col("seg"))
      .groupBy(col("seg"), col("segrank"))
      .agg(count(lit(1)).as("n"))
  }

  /** BIND / OpExtend (§2.2): computed column; eval errors become NULL and the
   * row is kept — SQL NULL semantics match (QueryIterAssign.java:67–69). */
  def q12_extend(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("disc_price",
        money(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
      .filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("disc_price"))

  /** OpUnfold / property-function generators (§2.2, §2.10): explode. */
  def q13_explode(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), explode(split(col("p_type"), " ")).as("type_word"))
      .groupBy(col("type_word"))
      .agg(count(lit(1)).as("n"))

  /** GROUP_CONCAT aggregate (§2.4): ordered deterministic concat via
   * sort_array(collect_list) — Jena's AggGroupConcat is arrival-ordered;
   * we force a total order for determinism (SURVEY §2.4 note). */
  def q14_groupconcat(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .groupBy(col("n_regionkey"))
      .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))

  /** Window function (SURVEY §2.5 — superset capability): top order per
   * customer by price; row_number with a total order ⇒ deterministic. */
  def q15_window(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        money(cents(col("o_totalprice"))).as("totalprice"))
  }
}
