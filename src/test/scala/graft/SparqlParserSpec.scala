package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

import graft.algebra._
import graft.model.{Term, Triple}
import graft.sparql.Parser

/** SPARQL text → algebra → DataFrame, end to end on golden queries —
 * manifest-style cases in the spirit of jena-arq/testing/ARQ/EngineMain. */
class SparqlParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val EX = "http://example/"
  private def i(s: String) = Term.iri(EX + s)

  private lazy val g: DataFrame = spark.createDataset(Seq(
    Triple(i("alice"), i("name"), Term.string("Alice")),
    Triple(i("alice"), i("email"), Term.string("alice@example")),
    Triple(i("alice"), i("age"), Term.lit("30", Term.XSD_INTEGER)),
    Triple(i("bob"), i("name"), Term.string("Bob")),
    Triple(i("bob"), i("age"), Term.lit("9", Term.XSD_INTEGER)),
    Triple(i("carol"), i("name"), Term.string("Carol")),
    Triple(i("carol"), i("email"), Term.string("carol@example")),
    Triple(i("carol"), i("age"), Term.lit("27", Term.XSD_INTEGER)),
    Triple(i("alice"), i("knows"), i("bob")),
    Triple(i("bob"), i("knows"), i("carol")),
    Triple(i("alice"), Term.iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), i("Person"))))
    .toDF()

  private def run(q: String): Array[Row] = Compiler.compile(Parser.parse(q), g).collect()
  private def lexes(q: String, v: String): Seq[String] =
    Compiler.compile(Parser.parse(q), g)
      .select(org.apache.spark.sql.functions.col(v).getField("lex"))
      .collect().map(_.getString(0)).toSeq

  test("BGP + FILTER + ORDER + LIMIT") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?s ?a WHERE {
        ?s ex:name ?n .
        ?s ex:age ?a .
        FILTER(?a >= 10)
      } ORDER BY DESC(?a) LIMIT 1"""
    assert(lexes(q, "s") == Seq(EX + "alice"))
  }

  test("SELECT * drops only GENERATED helper vars, not user ?__ vars") {
    // an ORDER BY expression introduces a hidden __ord0 column; a user
    // variable that merely starts with "__" must survive the cleanup
    val q = """
      PREFIX ex: <http://example/>
      SELECT * WHERE { ?__who ex:age ?a } ORDER BY DESC(STR(?a))"""
    val df = Compiler.compile(Parser.parse(q), g)
    assert(df.columns.toSet == Set("__who", "a"),
      s"user __ vars must survive, helpers must not: ${df.columns.mkString(",")}")
    assert(df.count() == 3)
  }

  test("negated property sets with inverse members !(p|^q) (P_NegPropSet)") {
    val P = """PREFIX ex: <http://example/>
      PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    """
    // forward-only NPS: exactly the knows edges survive the exclusions
    val fwd = run(P + "SELECT ?x ?y WHERE { ?x !(ex:name|ex:email|ex:age|rdf:type) ?y }")
    assert(fwd.length == 2)
    // inverse-only NPS: the same edges REVERSED (and nothing forward)
    val inv = lexes(P + "SELECT ?x ?y WHERE { ?x !(^ex:name|^ex:email|^ex:age|^rdf:type) ?y }", "x")
    assert(inv.toSet == Set(EX + "bob", EX + "carol"))
    // mixed members: union of both directions
    val mixed = run(P + """SELECT ?x ?y WHERE {
      ?x !(ex:name|ex:email|ex:age|rdf:type|^ex:name|^ex:email|^ex:age|^rdf:type) ?y }""")
    assert(mixed.length == 4)
  }

  test("SUM/AVG/GROUP_CONCAT DISTINCT parse and evaluate") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT (SUM(DISTINCT ?a) AS ?s) (AVG(DISTINCT ?a) AS ?m)
             (GROUP_CONCAT(DISTINCT ?n ; SEPARATOR=",") AS ?c)
      WHERE { ?p ex:age ?a . ?q ex:name ?n }"""
    val row = run(q).head
    // distinct ages {30, 9, 27}: sum 66, avg 22; names dedup across the
    // cross-joined pattern
    assert(row.getAs[Row]("s").getString(1) == "66")
    assert(row.getAs[Row]("m").getString(1) == "22.0")
    assert(row.getAs[Row]("c").getString(1) == "Alice,Bob,Carol")
  }

  test("OPTIONAL + BOUND filter") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?n WHERE {
        ?s ex:name ?n
        OPTIONAL { ?s ex:email ?e }
        FILTER(!BOUND(?e))
      }"""
    assert(lexes(q, "n") == Seq("Bob"))
  }

  test("UNION + DISTINCT") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT DISTINCT ?x WHERE {
        { ?s ex:email ?x } UNION { ?s ex:name ?x }
      }"""
    assert(lexes(q, "x").toSet.size == 5)
  }

  test("MINUS and FILTER NOT EXISTS differ on disjoint domains") {
    val minus = """
      PREFIX ex: <http://example/>
      SELECT ?s WHERE { ?s ex:name ?n MINUS { ?x ex:email ?e } }"""
    assert(run(minus).length == 3)
    val notExists = """
      PREFIX ex: <http://example/>
      SELECT ?s WHERE { ?s ex:name ?n FILTER NOT EXISTS { ?x ex:email ?e } }"""
    assert(run(notExists).isEmpty)
  }

  test("aggregates: GROUP BY + HAVING + COUNT/AVG") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
      GROUP BY ?s HAVING(?n > 3) ORDER BY ?s"""
    val rows = run(q)
    assert(rows.length == 1) // only alice (5 triples); bob and carol have 3
    val avg = """
      PREFIX ex: <http://example/>
      SELECT (AVG(?a) AS ?avg) WHERE { ?s ex:age ?a }"""
    assert(lexes(avg, "avg").head.toDouble == 22.0)
  }

  test("HAVING with an inline aggregate is hoisted into the group") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
      GROUP BY ?s HAVING(COUNT(?o) > 3) ORDER BY ?s"""
    assert(lexes(q, "s") == Seq(EX + "alice")) // 5 triples; bob/carol have 3
  }

  test("OFFSET without LIMIT") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?n WHERE { ?s ex:name ?n } ORDER BY ?n OFFSET 2"""
    assert(lexes(q, "n") == Seq("Carol"))
  }

  test("arithmetic results carry the XSD-promoted datatype") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?s (?a + 1 AS ?b) (?a / 2 AS ?h) WHERE { ?s ex:name ?n . ?s ex:age ?a }
      ORDER BY ?s"""
    val rows = run(q)
    val alice = rows.head
    def term(r: Row, idx: Int): Term = {
      val x = r.getAs[Row](idx)
      Term(x.getByte(0), x.getString(1), x.getString(2), x.getString(3))
    }
    assert(term(alice, 1) == Term.lit("31", Term.XSD_INTEGER))
    assert(term(alice, 2) == Term.lit("15.0", Term.XSD_DECIMAL))
  }

  test("path modifiers {n}, {n,m}, {n,}, {0,m}") {
    // knows chain: alice → bob → carol
    def q(mod: String) = s"""
      PREFIX ex: <http://example/>
      SELECT ?x WHERE { ex:alice ex:knows$mod ?x }"""
    assert(lexes(q("{1,2}"), "x").toSet == Set(EX + "bob", EX + "carol"))
    assert(lexes(q("{2,2}"), "x").toSet == Set(EX + "carol"))
    assert(lexes(q("{2}"), "x").toSet == Set(EX + "carol"))
    assert(lexes(q("{0,1}"), "x").toSet == Set(EX + "alice", EX + "bob"))
    assert(lexes(q("{1,}"), "x").toSet == Set(EX + "bob", EX + "carol"))
  }

  test("ORDER BY expressions and GROUP BY expressions") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?s WHERE { ?s ex:age ?a } ORDER BY DESC(?a + 1)"""
    assert(lexes(q, "s") == Seq(EX + "alice", EX + "carol", EX + "bob"))
    val g2 = """
      PREFIX ex: <http://example/>
      SELECT ?len (COUNT(?s) AS ?n) WHERE { ?s ex:name ?nm }
      GROUP BY (STRLEN(?nm) AS ?len) ORDER BY ?len"""
    val rows = run(g2)
    // Bob(3) → 1; Alice/Carol(5) → 2
    assert(rows.map(r => (r.getAs[Row](0).getString(1),
      r.getAs[Row](1).getString(1))).toSeq == Seq(("3", "1"), ("5", "2")))
  }

  test("FROM / FROM NAMED re-scope a quad dataset") {
    import graft.model.Quad
    val quads = spark.createDataset(Seq(
      Quad(i("a"), i("p"), Term.string("in-g1"), i("g1")),
      Quad(i("b"), i("p"), Term.string("in-g2"), i("g2")),
      Quad(i("c"), i("p"), Term.string("in-default"), Term.defaultGraph))).toDF()
    // FROM <g1>: default graph == g1's content only; the original default
    // graph and g2 disappear
    val q1 = s"""PREFIX ex: <$EX> SELECT ?o FROM ex:g1 WHERE { ?s ex:p ?o }"""
    assert(Compiler.compile(Parser.parse(q1), quads)
      .select(org.apache.spark.sql.functions.col("o").getField("lex"))
      .collect().map(_.getString(0)).toSeq == Seq("in-g1"))
    // FROM NAMED <g2>: only g2 is visible to GRAPH ?g
    val q2 = s"""PREFIX ex: <$EX>
      SELECT ?g ?o FROM NAMED ex:g2 WHERE { GRAPH ?g { ?s ex:p ?o } }"""
    val r2 = Compiler.compile(Parser.parse(q2), quads)
      .select(org.apache.spark.sql.functions.col("g").getField("lex"))
      .collect().map(_.getString(0)).toSeq
    assert(r2 == Seq(EX + "g2"))
  }

  test("GRAPH accepts any body shape (constant and variable graph names)") {
    import graft.model.Quad
    val quads = spark.createDataset(Seq(
      Quad(i("a"), i("name"), Term.string("A"), i("g1")),
      Quad(i("a"), i("mail"), Term.string("a@x"), i("g1")),
      Quad(i("b"), i("name"), Term.string("B"), i("g1")),
      Quad(i("a"), i("name"), Term.string("A-elsewhere"), i("g2")))).toDF()
    // OPTIONAL inside GRAPH <g1>: evaluated wholly against g1
    val q = s"""
      PREFIX ex: <$EX>
      SELECT ?n ?m WHERE {
        GRAPH ex:g1 { ?s ex:name ?n OPTIONAL { ?s ex:mail ?m } } }"""
    val rows = Compiler.compile(Parser.parse(q), quads)
      .collect().map(r => (r.getAs[Row]("n").getString(1),
        Option(r.getAs[Row]("m")).map(_.getString(1)))).toSet
    assert(rows == Set(("A", Some("a@x")), ("B", None)))
    // variable graph over a complex body: OPTIONAL evaluates per graph —
    // in g1 alice has mail, in g2 she does not
    val qv = s"""
      PREFIX ex: <$EX>
      SELECT ?g ?n ?m WHERE {
        GRAPH ?g { ?s ex:name ?n OPTIONAL { ?s ex:mail ?m } } }"""
    val vr = Compiler.compile(Parser.parse(qv), quads)
      .collect().map(r => (r.getAs[Row]("g").getString(1),
        r.getAs[Row]("n").getString(1),
        Option(r.getAs[Row]("m")).map(_.getString(1)))).toSet
    assert(vr == Set(
      (EX + "g1", "A", Some("a@x")),
      (EX + "g1", "B", None),
      (EX + "g2", "A-elsewhere", None)))
    // paths inside GRAPH ?var take the per-graph enumeration path
    // (GraphVarEnum) — parses and evaluates per named graph
    val pg = Parser.parse(
      s"""PREFIX ex: <$EX> SELECT ?n WHERE { GRAPH ?g { ?s ex:knows+ ?n . FILTER(BOUND(?n)) } }""")
    assert(findEnum(pg), "expected a GraphVarEnum node for a path body")
  }

  private def findEnum(op: Op): Boolean = op match {
    case GraphVarEnum(_, _) => true
    case Project(_, in) => findEnum(in)
    case Filter(_, in) => findEnum(in)
    case Distinct(in) => findEnum(in)
    case Join(l, r) => findEnum(l) || findEnum(r)
    case _ => false
  }

  test("DESCRIBE text forms") {
    val d1 = graft.sparql.Sparql.describeQuery(
      s"PREFIX ex: <$EX> DESCRIBE ex:bob", g)
    assert(d1.count() == 4) // bob's name/age/knows + alice knows bob
    val d2 = graft.sparql.Sparql.describeQuery(
      s"""PREFIX ex: <$EX> DESCRIBE ?s WHERE { ?s ex:email ?e }""", g)
    // alice (6 triples touching) + carol (4 triples touching), deduped set
    assert(d2.count() > 0 &&
      d2.count() == graft.sparql.Sparql.describeAll(
        Seq(EX + "alice", EX + "carol"), g).count())
  }

  test("function tail: REPLACE, REGEX flags, hashes, NOW/TZ, math") {
    val rep = """
      PREFIX ex: <http://example/>
      SELECT (REPLACE(?n, "a", "x", "i") AS ?r) WHERE { ex:alice ex:name ?n }"""
    assert(lexes(rep, "r") == Seq("xlice"))
    val rx = """
      PREFIX ex: <http://example/>
      SELECT ?n WHERE { ?s ex:name ?n . FILTER(REGEX(?n, "^ali", "i")) }"""
    assert(lexes(rx, "n") == Seq("Alice"))
    val fns = """
      PREFIX ex: <http://example/>
      SELECT (SHA1(?n) AS ?h) (SQRT(?a * ?a) AS ?sq) (TZ(NOW()) AS ?tz)
      WHERE { ex:bob ex:name ?n . ex:bob ex:age ?a }"""
    val row = run(fns).head
    assert(row.getAs[Row](0).getString(1).length == 40) // sha1 hex
    assert(row.getAs[Row](1).getString(1) == "9.0")     // math:* is double
  }

  test("blank nodes in query patterns are non-distinguished variables") {
    // _:x must NOT match stored bnode labels literally — it binds like a
    // variable (SPARQL 1.1 §4.1.4); the graph here has only IRI subjects
    val q = s"""
      PREFIX ex: <$EX>
      SELECT ?n WHERE { _:who ex:name ?n . _:who ex:email ?e }"""
    assert(lexes(q, "n").toSet == Set("Alice", "Carol"))
    // the label is scoped: two uses of _:who are the SAME variable (join)
    val q2 = s"""PREFIX ex: <$EX> SELECT ?n WHERE { _:a ex:name ?n }"""
    assert(lexes(q2, "n").toSet == Set("Alice", "Bob", "Carol"))
  }

  test("RDF 1.2 triple-term constants <<( )>> match stored triple terms") {
    import graft.model.Quad
    val stmt = Term(Term.KIND_TRIPLE_TERM,
      s"""<<( <${EX}alice> <${EX}age> "30"^^<${Term.XSD_INTEGER}> )>>""", "", "")
    val g2 = spark.createDataset(Seq(
      Triple(i("cert1"), i("states"), stmt),
      Triple(i("cert1"), i("by"), i("bob")),
      Triple(i("cert2"), i("states"), Term.string("not-a-triple-term")))).toDF()
    val q = s"""
      PREFIX ex: <$EX>
      SELECT ?c ?w WHERE {
        ?c ex:states <<( ex:alice ex:age 30 )>> .
        ?c ex:by ?w }"""
    val rows = Compiler.compile(Parser.parse(q), g2).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Row]("w").getString(1) == EX + "bob")
    // SUBJECT/OBJECT accessors recover the components from the bound term
    val acc = s"""
      PREFIX ex: <$EX>
      SELECT (SUBJECT(?t) AS ?s0) (OBJECT(?t) AS ?o0)
      WHERE { ex:cert1 ex:states ?t }"""
    val r = Compiler.compile(Parser.parse(acc), g2).head()
    assert(r.getAs[Row](0).getString(1) == EX + "alice")
    assert(r.getAs[Row](1).getString(1) == "30")
    // VARIABLE-bearing quoted triples desugar to accessor binds/filters:
    // match the stored statement, bind its subject, join on the certifier
    val varQ = s"""
      PREFIX ex: <$EX>
      SELECT ?x ?w WHERE {
        ?c ex:states <<( ?x ex:age 30 )>> .
        ?c ex:by ?w }"""
    val vr = Compiler.compile(Parser.parse(varQ), g2).collect()
    assert(vr.length == 1)
    assert(vr.head.getAs[Row]("x").getString(1) == EX + "alice")
    assert(vr.head.getAs[Row]("w").getString(1) == EX + "bob")
    // non-matching constant component inside the quoted pattern → no rows
    val miss = s"""
      PREFIX ex: <$EX>
      SELECT ?x WHERE { ?c ex:states <<( ?x ex:height 30 )>> }"""
    assert(Compiler.compile(Parser.parse(miss), g2).count() == 0)
    // SELECT * must not leak the internal __qt var
    val star = Compiler.compile(Parser.parse(
      s"""PREFIX ex: <$EX> SELECT * WHERE { ?c ex:states <<( ?x ex:age 30 )>> }"""), g2)
    assert(!star.columns.exists(_.startsWith("__")))
  }

  test("property paths: +, alternation, inverse, sequence") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?x WHERE { ex:alice ex:knows+ ?x }"""
    assert(lexes(q, "x").toSet == Set(EX + "bob", EX + "carol"))
    val inv = """
      PREFIX ex: <http://example/>
      SELECT ?x WHERE { ex:carol ^ex:knows ?x }"""
    assert(lexes(inv, "x") == Seq(EX + "bob"))
    val seq = """
      PREFIX ex: <http://example/>
      SELECT ?x WHERE { ex:alice ex:knows/ex:knows ?x }"""
    assert(lexes(seq, "x") == Seq(EX + "carol"))
  }

  test("BIND + expression functions + SELECT expression") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?u WHERE {
        ?s ex:name ?n .
        BIND(UCASE(?n) AS ?u)
        FILTER(STRSTARTS(?n, "A"))
      }"""
    assert(lexes(q, "u") == Seq("ALICE"))
    val sel = """
      PREFIX ex: <http://example/>
      SELECT (STRLEN(?n) AS ?len) WHERE { ?s ex:name ?n . FILTER(?n = "Carol") }"""
    assert(lexes(sel, "len") == Seq("5"))
  }

  test("VALUES + 'a' keyword + rdf:type") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?s ?n WHERE {
        VALUES ?s { ex:alice ex:bob }
        ?s ex:name ?n .
        ?s a ex:Person .
      }"""
    assert(lexes(q, "n") == Seq("Alice"))
  }

  test("arithmetic + comparisons by numeric value") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?s WHERE { ?s ex:age ?a . FILTER(?a * 2 > 50) } ORDER BY ?s"""
    assert(lexes(q, "s") == Seq(EX + "alice", EX + "carol"))
  }

  test("subquery: aggregate inside, join outside; scopes don't leak") {
    val q = """
      PREFIX ex: <http://example/>
      SELECT ?s ?n ?cnt WHERE {
        ?s ex:name ?n .
        { SELECT (COUNT(?x) AS ?cnt) WHERE { ?y ex:knows ?x } }
        FILTER(?cnt = 2)
      } ORDER BY ?s"""
    val rows = run(q)
    assert(rows.length == 3) // uncorrelated subquery joins onto every row
    // outer query must NOT have been grouped by the subquery's aggregate
    assert(lexes(q, "n").sorted == Seq("Alice", "Bob", "Carol"))
  }

  test("unsupported constructs raise") {
    intercept[IllegalArgumentException](Parser.parse("ASK { ?s ?p ?o }"))
    // SERVICE executes against ServiceRegistry endpoints (ServiceSpec);
    // an UNREGISTERED endpoint raises without SILENT, and SILENT over an
    // unregistered endpoint degrades to the unit table
    val q = Parser.parse("SELECT ?s WHERE { SERVICE <http://x> { ?s ?p ?o } }")
    intercept[IllegalArgumentException](Compiler.compile(q, g))
    val silent = Parser.parse(
      "SELECT ?s WHERE { SERVICE SILENT <http://x> { ?s ?p ?o } }")
    assert(Compiler.compile(silent, g).count() == 1) // unit table
  }
}
