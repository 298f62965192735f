package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algebra.TermCols
import graft.model.{Term, Triple}
import graft.sparql.Update

/** SPARQL Update semantics (reference: UpdateEngineWorker.java:66,342,370):
 * data forms, template forms, WHERE-once evaluation, set semantics. */
class UpdateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val EX = "http://example/"
  private def i(s: String) = Term.iri(EX + s)

  private lazy val g: DataFrame = spark.createDataset(Seq(
    Triple(i("alice"), i("name"), Term.string("Alice")),
    Triple(i("bob"), i("name"), Term.string("Bob")),
    Triple(i("alice"), i("status"), Term.string("old")),
    Triple(i("bob"), i("status"), Term.string("old")))).toDF()

  private def triples(df: DataFrame): Set[(String, String, String)] =
    df.select(TermCols.lex(col("s")), TermCols.lex(col("p")), TermCols.lex(col("o")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("INSERT DATA adds; set semantics make it idempotent") {
    val u = s"""PREFIX ex: <$EX> INSERT DATA { ex:carol ex:name "Carol" }"""
    val once = Update.run(g, u)
    assert(once.count() == 5)
    assert(Update.run(once, u).count() == 5) // idempotent
    assert(triples(once).contains((EX + "carol", EX + "name", "Carol")))
  }

  test("DELETE DATA removes exactly the stated triple") {
    val out = Update.run(g,
      s"""PREFIX ex: <$EX> DELETE DATA { ex:alice ex:status "old" }""")
    assert(out.count() == 3)
    assert(!triples(out).contains((EX + "alice", EX + "status", "old")))
    assert(triples(out).contains((EX + "bob", EX + "status", "old")))
  }

  test("DELETE/INSERT WHERE: bindings from the pre-state, delete before insert") {
    val out = Update.run(g, s"""
      PREFIX ex: <$EX>
      DELETE { ?s ex:status "old" }
      INSERT { ?s ex:status "new" }
      WHERE { ?s ex:status "old" }""")
    val ts = triples(out)
    assert(out.count() == 4)
    assert(ts.contains((EX + "alice", EX + "status", "new")))
    assert(ts.contains((EX + "bob", EX + "status", "new")))
    assert(!ts.exists(t => t._3 == "old"))
  }

  test("DELETE WHERE: pattern is both template and matcher") {
    val out = Update.run(g,
      s"""PREFIX ex: <$EX> DELETE WHERE { ?s ex:status ?x }""")
    assert(out.count() == 2)
    assert(triples(out).forall(_._2 == EX + "name"))
  }

  test("compound request applies in order; CLEAR empties") {
    val out = Update.run(g, s"""
      PREFIX ex: <$EX>
      INSERT DATA { ex:carol ex:status "old" } ;
      DELETE WHERE { ?s ex:status "old" }""")
    // carol's insert happens first, then the delete removes all three
    assert(out.count() == 2)
    assert(Update.run(g, "CLEAR ALL").count() == 0)
  }

  test("INSERT template blank nodes are fresh per binding") {
    val out = Update.run(g, s"""
      PREFIX ex: <$EX>
      INSERT { ?s ex:card _:b } WHERE { ?s ex:name ?n }""")
    val cards = out.filter(TermCols.lex(col("p")) === EX + "card")
    assert(cards.count() == 2)
    // two distinct fresh bnode objects
    assert(cards.select(TermCols.lex(col("o"))).distinct().count() == 2)
    assert(cards.filter(TermCols.isBlank(col("o"))).count() == 2)
  }

  test("DELETE template with a blank node raises") {
    intercept[IllegalArgumentException] {
      Update.parse(s"""PREFIX ex: <$EX> DELETE { ?s ex:p _:b } WHERE { ?s ex:p ?o }""")
    }
    intercept[IllegalArgumentException] {
      Update.parse(s"""PREFIX ex: <$EX> DELETE DATA { ex:a ex:p _:b }""")
    }
    intercept[IllegalArgumentException] {
      Update.parse(s"""PREFIX ex: <$EX> INSERT DATA { ?v ex:p ex:o }""")
    }
  }
}
