package graft.functions

import org.apache.spark.sql.Column

/**
 * Custom scalar-function and aggregate registries — the Spark mapping of
 * the reference's `FunctionRegistry` (sparql/function/FunctionRegistry.java)
 * and `AggregateRegistry` (sparql/expr/aggregate/AggregateRegistry.java).
 * A registered builder is a Column-level composition over term structs
 * (same contract as SparqlFunctions); the SPARQL text parser resolves
 * unknown function names here after the built-ins, so custom functions are
 * callable from query text without touching the parser.
 *
 * Names are case-insensitive (stored lower-cased) — SPARQL built-in call
 * syntax is case-insensitive and custom names follow suit.
 */
object Registry {

  private val fns =
    new scala.collection.concurrent.TrieMap[String, Seq[Column] => Column]
  private val aggs =
    new scala.collection.concurrent.TrieMap[String, Column => Column]

  /** Register a scalar function: args are term-struct Columns, result a
   * term struct (or boolean Column for filter use). */
  def registerFunction(name: String, f: Seq[Column] => Column): Unit =
    fns.put(name.toLowerCase, f)

  /** Register a (single-argument) aggregate: input is the term column,
   * result must be an aggregate Column producing a term struct. */
  def registerAggregate(name: String, f: Column => Column): Unit =
    aggs.put(name.toLowerCase, f)

  def function(name: String): Option[Seq[Column] => Column] =
    fns.get(name.toLowerCase)
  def aggregate(name: String): Option[Column => Column] =
    aggs.get(name.toLowerCase)

  def unregisterFunction(name: String): Unit = fns.remove(name.toLowerCase)
  def unregisterAggregate(name: String): Unit = aggs.remove(name.toLowerCase)

  // --- pre-registered ARQ function-library tail (reference:
  //     sparql/function/library/ — the `afn:`/`jfn:` Java-semantics string
  //     helpers the ARQ test suites call by IRI). Java semantics: 0-based
  //     substring(start[, end]), exclusive end.
  private val ArqFnNs = Seq(
    "http://jena.apache.org/ARQ/function#",
    "http://jena.hpl.hp.com/ARQ/function#")
  locally {
    import org.apache.spark.sql.functions._
    import graft.algebra.TermCols
    def lexOf(c: Column): Column = TermCols.lex(c)
    def intOf(c: Column): Column = lexOf(c).cast("long")
    ArqFnNs.foreach { ns =>
      registerFunction(ns + "strlen",
        args => TermCols.intTerm(length(lexOf(args(0)))))
      registerFunction(ns + "substring", {
        case Seq(s0, b) =>
          TermCols.strTerm(lexOf(s0).substr(intOf(b) + 1, length(lexOf(s0))))
        case Seq(s0, b, e) =>
          TermCols.strTerm(lexOf(s0).substr(intOf(b) + 1, intOf(e) - intOf(b)))
        case other => throw new IllegalArgumentException(
          s"afn:substring takes 2 or 3 arguments, got ${other.size}")
      })
      registerFunction(ns + "sha1sum",
        args => TermCols.strTerm(sha1(lexOf(args(0)).cast("binary"))))
    }
    // the cdt: composite-datatype function library (SPARQL-CDTs)
    graft.cdt.CdtFunctions.register()
    // geof: point-geometry functions (GeoSPARQL-lite, ops.Geo)
    graft.ops.Geo.registerFunctions()
  }
}

/**
 * CDT map functions (reference: function/library/cdt/ — CDT maps as
 * MapType columns per SURVEY §1.7, the sibling of the ArrayType CDT list
 * mapping). All plain `functions` compositions.
 */
object CdtMap {
  import org.apache.spark.sql.functions._

  /** cdt:get — value for a key; NULL (eval error) when absent. */
  def mapGet(m: Column, k: Column): Column = element_at(m, k)
  /** cdt:keys as an array column. */
  def mapKeys(m: Column): Column = map_keys(m)
  /** cdt:size. */
  def mapSize(m: Column): Column = size(m)
  /** cdt:put — functional update (right side wins on key collision). */
  def mapPut(m: Column, k: Column, v: Column): Column =
    map_concat(map_filter(m, (key, _) => key =!= k), map(k, v))
  /** cdt:merge of two maps (right side wins). */
  def mapMerge(a: Column, b: Column): Column =
    map_concat(map_filter(a, (key, _) => !array_contains(map_keys(b), key)), b)
  /** FOLD into a map — aggregate (key, value) entries per group (the map
   * sibling of SparqlAggregates.foldList). Keys must be unique within the
   * group — duplicates raise, like the reference's CDT map constructor;
   * entries are sorted for cross-partition determinism. */
  def foldMap(k: Column, v: Column): Column =
    map_from_entries(sort_array(collect_list(struct(k, v))))
}
