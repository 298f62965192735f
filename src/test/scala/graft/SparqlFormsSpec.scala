package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Iso, Term, Triple}
import graft.sparql.Sparql

/** ASK / CONSTRUCT text forms + bnode-isomorphism comparison (SURVEY §5). */
class SparqlFormsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val EX = "http://example/"
  private def i(s: String) = Term.iri(EX + s)

  private lazy val g: DataFrame = spark.createDataset(Seq(
    Triple(i("alice"), i("name"), Term.string("Alice")),
    Triple(i("alice"), i("email"), Term.string("alice@x")),
    Triple(i("bob"), i("name"), Term.string("Bob")))).toDF()

  test("ASK") {
    assert(Sparql.ask(
      """PREFIX ex: <http://example/> ASK { ?s ex:email ?e }""", g))
    assert(!Sparql.ask(
      """PREFIX ex: <http://example/> ASK WHERE { ?s ex:phone ?p }""", g))
  }

  test("CONSTRUCT text form: template with bnode, dedup, well-formedness") {
    val q = """
      PREFIX ex: <http://example/>
      PREFIX foaf: <http://xmlns.com/foaf/0.1/>
      CONSTRUCT {
        ?s foaf:name ?n .
        _:card ex:of ?s ; ex:label ?n .
      } WHERE { ?s ex:name ?n }"""
    val out = Sparql.construct(q, g).collect()
    assert(out.length == 6) // 2 rows × 3 template patterns
    val bn = out.filter(_.getAs[Row]("s").getByte(0) == Term.KIND_BNODE)
    assert(bn.length == 4)
    // the same _:card bnode is shared by the two patterns of one row
    assert(bn.map(_.getAs[Row]("s").getString(1)).distinct.length == 2)
  }

  test("CONSTRUCT bnode co-reference is pinned across template branches") {
    import graft.algebra._
    // solutions arrive through a shuffle; each template branch consumes
    // the row-tagged frame, and without the eager checkpoint a re-plan
    // between branches could assign different __row ids to the same
    // solution (breaking cross-pattern co-reference). Assert the output
    // pairing: every bnode carries exactly one ex:of and one ex:label,
    // and the (subject, name) pairing matches the source data.
    val sols = Compiler.compile(Bgp(Seq(
      TriplePattern(TVar("s"), TConst(i("name")), TVar("n")))),
      g.repartition(5))
    val out = Construct.construct(Seq(
      TriplePattern(TConst(Term.bnode("c")), TConst(i("of")), TVar("s")),
      TriplePattern(TConst(Term.bnode("c")), TConst(i("label")), TVar("n"))),
      sols).collect()
    val byB = out.groupBy(_.getAs[Row]("s").getString(1))
    assert(byB.size == 2)
    val pairing = byB.values.map { ts =>
      def obj(p: String) = ts.filter(_.getAs[Row]("p").getString(1) == EX + p)
        .map(_.getAs[Row]("o").getString(1))
      (obj("of").toSeq, obj("label").toSeq)
    }.toSet
    assert(pairing == Set(
      (Seq(EX + "alice"), Seq("Alice")), (Seq(EX + "bob"), Seq("Bob"))),
      s"bnode co-reference broken: $pairing")
  }

  test("DESCRIBE: resource slice + bnode closure") {
    val gd = spark.createDataset(Seq(
      Triple(i("alice"), i("addr"), Term.bnode("b1")),
      Triple(Term.bnode("b1"), i("city"), Term.string("Paris")),
      Triple(Term.bnode("b1"), i("geo"), Term.bnode("b2")),
      Triple(Term.bnode("b2"), i("lat"), Term.string("48.85")),
      Triple(i("bob"), i("knows"), i("alice")),
      Triple(i("bob"), i("name"), Term.string("Bob")))).toDF()
    val out = Sparql.describe(EX + "alice", gd).collect()
    // alice's triple + bnode closure (2 hops) + bob-knows-alice; NOT bob's name
    assert(out.length == 5)
    assert(!out.exists(_.getAs[Row]("o").getString(1) == "Bob"))
  }

  test("Iso: graphs equal up to bnode relabeling; different structure rejected") {
    def t(s: Term, p: String, o: Term) = Triple(s, Term.iri(EX + p), o)
    val g1 = Seq(
      t(Term.bnode("a"), "p", Term.bnode("b")),
      t(Term.bnode("b"), "p", Term.bnode("c")),
      t(Term.bnode("c"), "q", Term.string("end")),
      t(i("x"), "r", Term.bnode("a")))
    val g2 = Seq( // same shape, permuted labels
      t(Term.bnode("n2"), "p", Term.bnode("n3")),
      t(Term.bnode("n1"), "p", Term.bnode("n2")),
      t(Term.bnode("n3"), "q", Term.string("end")),
      t(i("x"), "r", Term.bnode("n1")))
    assert(Iso.isomorphic(g1, g2))
    // break the chain: c points to itself
    val g3 = g2.updated(0, t(Term.bnode("n2"), "p", Term.bnode("n2")))
    assert(!Iso.isomorphic(g1, g3))
    // ground mismatch
    val g4 = g2.updated(3, t(i("y"), "r", Term.bnode("n1")))
    assert(!Iso.isomorphic(g1, g4))
    // symmetric star case (identical signatures need backtracking)
    val s1 = Seq(t(Term.bnode("u"), "p", Term.string("1")),
      t(Term.bnode("v"), "p", Term.string("1")))
    val s2 = Seq(t(Term.bnode("w"), "p", Term.string("1")),
      t(Term.bnode("z"), "p", Term.string("1")))
    assert(Iso.isomorphic(s1, s2))
  }
}
