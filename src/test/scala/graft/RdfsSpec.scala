package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Term, Triple}
import graft.reason.Rdfs

/** RDFS materialization vs hand-computed closure (reference semantics:
 * ApplyRDFS rule set, SURVEY.md §2.12). */
class RdfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val EX = "http://example/"
  private def i(s: String) = Term.iri(EX + s)
  private def t(s: Term, p: Term, o: Term) = Triple(s, p, o)

  private def g(ts: Triple*): DataFrame = spark.createDataset(ts).toDF()

  private def spoSet(df: DataFrame): Set[(String, String, String)] =
    df.collect().map { r =>
      def lx(c: String) = r.getAs[org.apache.spark.sql.Row](c).getString(1)
      (lx("s"), lx("p"), lx("o"))
    }.toSet

  test("subclass transitivity, subproperty, domain/range through hierarchy") {
    val schema = g(
      t(i("Dog"), Term.iri(Rdfs.SUBCLASS), i("Mammal")),
      t(i("Mammal"), Term.iri(Rdfs.SUBCLASS), i("Animal")),
      t(i("hasPet"), Term.iri(Rdfs.SUBPROP), i("knows")),
      t(i("knows"), Term.iri(Rdfs.DOMAIN), i("Person")),
      t(i("hasPet"), Term.iri(Rdfs.RANGE), i("Animal")))
    val data = g(
      t(i("alice"), i("hasPet"), i("rex")),
      t(i("rex"), Term.iri(Rdfs.RDF_TYPE), i("Dog")),
      t(i("rex"), i("name"), Term.string("Rex"))) // literal object: no range typing

    val out = spoSet(Rdfs.materialize(data, schema))
    val TY = Rdfs.RDF_TYPE
    // rdfs7: hasPet ⊑ knows
    assert(out.contains((EX + "alice", EX + "knows", EX + "rex")))
    // rdfs2 via hierarchy: hasPet ⊑ knows, knows domain Person
    assert(out.contains((EX + "alice", TY, EX + "Person")))
    // rdfs3: hasPet range Animal
    assert(out.contains((EX + "rex", TY, EX + "Animal")))
    // rdfs9 + rdfs11: Dog ⊑ Mammal ⊑ Animal
    assert(out.contains((EX + "rex", TY, EX + "Mammal")))
    assert(out.contains((EX + "rex", TY, EX + "Animal")))
    // rdfs9 applies to rdfs2-inferred types too? Person has no superclass,
    // so just check no literal typing leaked and inputs survive
    assert(out.contains((EX + "rex", EX + "name", "Rex")))
    assert(!out.exists { case (s, p, o) => s == "Rex" })
  }

  test("rdfs9 fires on types inferred by rdfs2/3 (not only asserted types)") {
    val schema = g(
      t(i("Employee"), Term.iri(Rdfs.SUBCLASS), i("Person")),
      t(i("worksAt"), Term.iri(Rdfs.DOMAIN), i("Employee")))
    val data = g(t(i("bob"), i("worksAt"), i("acme")))
    val out = spoSet(Rdfs.materialize(data, schema))
    assert(out.contains((EX + "bob", Rdfs.RDF_TYPE, EX + "Employee"))) // rdfs2
    assert(out.contains((EX + "bob", Rdfs.RDF_TYPE, EX + "Person")))   // rdfs9 on inferred
  }

  test("materialization is idempotent (closure of closure = closure)") {
    val schema = g(
      t(i("A"), Term.iri(Rdfs.SUBCLASS), i("B")),
      t(i("B"), Term.iri(Rdfs.SUBCLASS), i("C")))
    val data = g(t(i("x"), Term.iri(Rdfs.RDF_TYPE), i("A")))
    val once = Rdfs.materialize(data, schema)
    val twice = Rdfs.materialize(once, schema)
    assert(spoSet(once) == spoSet(twice))
  }
}
