package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

import graft.algebra.Compiler
import graft.model.{Iso, Term, Triple}
import graft.riot.{ResultSetIO, TurtleLite}
import graft.sparql.{Parser, Sparql}

/**
 * Manifest-style golden cases — the test strategy of the reference's
 * EngineMain suites (jena-arq/testing/ARQ/EngineMain: a data .ttl, a
 * query .rq, an expected .srx/.srj per case). Each case here carries the
 * same three artifacts inline; the runner executes
 * data → TurtleLite → Parser → Compiler and compares against the expected
 * RESULTS DOCUMENT parsed back through the result-set READERS
 * (RowSetReaderJSON / RowSetReaderXML analogs), so writer+reader+engine
 * are exercised together. CONSTRUCT cases compare graphs via bnode
 * isomorphism (Iso).
 */
class GoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val data = """
    @prefix ex: <http://example/> .
    ex:alice ex:name "Alice" ; ex:age 30 ; ex:knows ex:bob .
    ex:bob   ex:name "Bob"   ; ex:age 9  ; ex:knows ex:carol .
    ex:carol ex:name "Carol" ; ex:age 27 ; ex:mail "c@x" .
    ex:dave  ex:name "Dave"@en .
  """

  private lazy val g: DataFrame =
    spark.createDataset(TurtleLite.parse(data))(
      org.apache.spark.sql.Encoders.product[Triple]).toDF()

  /** Canonical multiset of solution rows for order-insensitive compare. */
  private def canon(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq
      .map(_.toSeq.map {
        case r: Row => (r.getByte(0), r.getString(1), r.getString(2), r.getString(3))
        case null => null
      })
      .sortBy(_.toString)
  }

  private def runCase(query: String, expectedSrj: String): Unit = {
    val got = Compiler.compile(Parser.parse(query), g)
    val exp = ResultSetIO.fromSparqlJson(spark, expectedSrj)
    assert(got.columns.sorted.toSeq == exp.columns.sorted.toSeq,
      s"vars: ${got.columns.toSeq} vs ${exp.columns.toSeq}")
    assert(canon(got) == canon(exp))
  }

  private def uri(v: String) = s"""{"type":"uri","value":"http://example/$v"}"""
  private def str(v: String) = s"""{"type":"literal","value":"$v"}"""
  private def int(v: String) =
    s"""{"type":"literal","value":"$v","datatype":"http://www.w3.org/2001/XMLSchema#integer"}"""

  private def srj(vars: Seq[String], bindings: String*): String =
    s"""{"head":{"vars":[${vars.map("\"" + _ + "\"").mkString(",")}]},
        "results":{"bindings":[${bindings.mkString(",")}]}}"""

  test("golden: FILTER on numeric value") {
    runCase(
      """PREFIX ex: <http://example/>
         SELECT ?s ?a WHERE { ?s ex:age ?a . FILTER(?a > 10) }""",
      srj(Seq("s", "a"),
        s"""{"s":${uri("alice")},"a":${int("30")}}""",
        s"""{"s":${uri("carol")},"a":${int("27")}}"""))
  }

  test("golden: OPTIONAL leaves unbound vars out of the binding") {
    runCase(
      """PREFIX ex: <http://example/>
         SELECT ?n ?m WHERE { ?s ex:name ?n OPTIONAL { ?s ex:mail ?m } }""",
      srj(Seq("n", "m"),
        s"""{"n":${str("Alice")}}""",
        s"""{"n":${str("Bob")}}""",
        s"""{"n":${str("Carol")},"m":${str("c@x")}}""",
        s"""{"n":{"type":"literal","value":"Dave","xml:lang":"en"}}"""))
  }

  test("golden: UNION + DISTINCT") {
    runCase(
      """PREFIX ex: <http://example/>
         SELECT DISTINCT ?x WHERE {
           { ex:alice ex:knows ?x } UNION { ?x ex:mail ?m } }""",
      srj(Seq("x"), s"""{"x":${uri("bob")}}""", s"""{"x":${uri("carol")}}"""))
  }

  test("golden: ORDER BY DESC + LIMIT keeps order") {
    val got = Compiler.compile(Parser.parse(
      """PREFIX ex: <http://example/>
         SELECT ?s WHERE { ?s ex:age ?a } ORDER BY DESC(?a) LIMIT 2"""), g)
    val exp = ResultSetIO.fromSparqlJson(spark,
      srj(Seq("s"), s"""{"s":${uri("alice")}}""", s"""{"s":${uri("carol")}}"""))
    // ordered compare (no sort)
    assert(got.collect().toSeq.map(_.toString) == exp.collect().toSeq.map(_.toString))
  }

  test("golden: GROUP BY + COUNT (expected via the XML reader)") {
    val xml = """<?xml version="1.0"?>
      <sparql xmlns="http://www.w3.org/2005/sparql-results#">
        <head><variable name="s"/><variable name="n"/></head>
        <results>
          <result><binding name="s"><uri>http://example/alice</uri></binding>
            <binding name="n"><literal datatype="http://www.w3.org/2001/XMLSchema#integer">1</literal></binding></result>
          <result><binding name="s"><uri>http://example/bob</uri></binding>
            <binding name="n"><literal datatype="http://www.w3.org/2001/XMLSchema#integer">1</literal></binding></result>
        </results>
      </sparql>"""
    val got = Compiler.compile(Parser.parse(
      """PREFIX ex: <http://example/>
         SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ex:knows ?o } GROUP BY ?s"""), g)
    val exp = ResultSetIO.fromSparqlXml(spark, xml)
    assert(canon(got) == canon(exp))
  }

  test("golden: property path through the text parser") {
    runCase(
      """PREFIX ex: <http://example/>
         SELECT ?x WHERE { ex:alice ex:knows+ ?x }""",
      srj(Seq("x"), s"""{"x":${uri("bob")}}""", s"""{"x":${uri("carol")}}"""))
  }

  test("golden: lang-tagged literal round-trips through writer and reader") {
    val sols = Compiler.compile(Parser.parse(
      """PREFIX ex: <http://example/>
         SELECT ?n WHERE { ex:dave ex:name ?n }"""), g)
    // writer → reader round trip must reproduce the solution exactly
    val viaJson = ResultSetIO.fromSparqlJson(spark, ResultSetIO.toSparqlJson(sols))
    val viaXml = ResultSetIO.fromSparqlXml(spark, ResultSetIO.toSparqlXml(sols))
    assert(canon(sols) == canon(viaJson))
    assert(canon(sols) == canon(viaXml))
    // and the TSV writer renders the full term syntax, round-tripping
    // through the TSV READER
    val tsv = ResultSetIO.toTsv(sols)
    assert(tsv.contains("\"Dave\"@en"))
    assert(canon(sols) == canon(ResultSetIO.fromTsv(spark, tsv)))
  }

  test("golden: CONSTRUCT compared by bnode isomorphism") {
    val got = Sparql.construct(
      """PREFIX ex: <http://example/>
         CONSTRUCT { ?s ex:label ?n . ?s ex:via _:w } WHERE { ?s ex:mail ?m . ?s ex:name ?n }""", g)
    val expected = TurtleLite.parse("""
      @prefix ex: <http://example/> .
      ex:carol ex:label "Carol" .
      ex:carol ex:via _:x .
    """)
    val gotTriples = got.as[Triple].collect().toSeq
    assert(Iso.isomorphic(gotTriples, expected))
  }
}
