package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.algebra.{Compiler, ServiceRegistry}
import graft.model.Term
import graft.model.Triple
import graft.sparql.Sparql

/** SERVICE execution against registered endpoints (loopback federation —
 * the zero-egress twin of the reference's ServiceExec over HTTP). */
class ServiceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val EX = "http://example/"
  private def i(s: String) = Term.iri(EX + s)

  private lazy val localGraph: DataFrame = {
    import spark.implicits._
    spark.createDataset(Seq(
      Triple(i("alice"), i("name"), Term.string("Alice")),
      Triple(i("bob"), i("name"), Term.string("Bob")),
      Triple(i("carol"), i("name"), Term.string("Carol")))).toDF()
  }
  // two "remote" datasets holding emails / phones for subsets of people
  private lazy val emailsGraph: DataFrame = {
    import spark.implicits._
    spark.createDataset(Seq(
      Triple(i("alice"), i("email"), Term.string("alice@example")),
      Triple(i("carol"), i("email"), Term.string("carol@example")))).toDF()
  }
  private lazy val phonesGraph: DataFrame = {
    import spark.implicits._
    spark.createDataset(Seq(
      Triple(i("bob"), i("email"), Term.string("bob@elsewhere")))).toDF()
  }

  private def withEndpoints[A](f: => A): A = {
    ServiceRegistry.register(EX + "emails", Compiler.DfGraph(emailsGraph))
    ServiceRegistry.register(EX + "phones", Compiler.DfGraph(phonesGraph))
    try f finally ServiceRegistry.clear()
  }

  private def lexes(df: DataFrame, c: String): Set[String] =
    df.select(col(c).getField("lex")).collect().map(_.getString(0)).toSet

  test("SERVICE <iri>: inner pattern evaluates remotely, joins locally") {
    withEndpoints {
      val out = Sparql.select(
        s"""SELECT ?s ?mail WHERE {
              ?s <${EX}name> ?n .
              SERVICE <${EX}emails> { ?s <${EX}email> ?mail }
            }""", localGraph)
      assert(lexes(out, "mail") == Set("alice@example", "carol@example"))
    }
  }

  test("SERVICE ?ep: variable target enumerates registered endpoints") {
    withEndpoints {
      val out = Sparql.select(
        s"""SELECT ?ep ?s ?mail WHERE {
              ?s <${EX}name> ?n .
              SERVICE ?ep { ?s <${EX}email> ?mail }
            }""", localGraph)
      val rows = out.collect().map(r =>
        (r.getStruct(0).getString(1), r.getStruct(2).getString(1))).toSet
      assert(rows == Set(
        (EX + "emails", "alice@example"),
        (EX + "emails", "carol@example"),
        (EX + "phones", "bob@elsewhere")))
    }
  }

  test("SERVICE SILENT over an unknown endpoint = unit table") {
    withEndpoints {
      val out = Sparql.select(
        s"""SELECT ?s ?mail WHERE {
              ?s <${EX}name> ?n .
              SERVICE SILENT <${EX}nowhere> { ?s <${EX}email> ?mail }
            }""", localGraph)
      // unit join: all three outer rows survive, ?mail unbound
      assert(out.count() == 3)
      assert(out.collect().forall(_.isNullAt(1)))
    }
  }

  test("SERVICE over an unknown endpoint raises without SILENT") {
    withEndpoints {
      val e = intercept[IllegalArgumentException] {
        Sparql.select(
          s"""SELECT * WHERE { SERVICE <${EX}nowhere> { ?s ?p ?o } }""",
          localGraph)
      }
      assert(e.getMessage.contains("not registered"))
    }
  }
}
