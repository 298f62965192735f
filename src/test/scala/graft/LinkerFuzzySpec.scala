package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Candidate
import graft.fixtures.DictRow
import graft.link.Linker
import graft.model.Term

/** Fuzzy MinHash-LSH entity linking: typo'd surfaces recover their
 * dictionary entity; exact hits keep working; garbage stays unlinked. */
class LinkerFuzzySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val KG = "http://example.org/kg/"
  private def mention(surface: String, k: Int): Candidate =
    Candidate(Term.iri(s"${KG}file/f$k"), Term.iri(s"${KG}imports"),
      null, surface, "r0", "x", s"sha$k")

  test("typo'd mentions link to the right entity; exact and unlinkable unaffected") {
    import spark.implicits._
    val dict = spark.createDataset(Seq(
      DictRow(KG + "entity/SparkContext", "SparkContext", 1.0),
      DictRow(KG + "entity/SparkSession", "SparkSession", 1.0),
      DictRow(KG + "entity/DataFrameWriter", "DataFrameWriter", 1.0)))
    val cands = spark.createDataset(Seq(
      mention("SparkContext", 1),      // exact
      mention("SparkContxt", 2),       // dropped char → fuzzy
      mention("DataFrameWritter", 3),  // doubled char → fuzzy
      mention("SparkSesion", 4),       // dropped char → fuzzy
      mention("zzz_qqq_totally_unknown", 5), // garbage → dropped
      Candidate(Term.iri(s"${KG}file/f9"), Term.iri(s"${KG}inLang"),
        Term.string("x"), "", "r0", "x", "sha9"))) // passthrough

    val linked = Linker.fuzzy(cands, dict).collect()
    val bySha = linked.filter(_.surface == "").filter(_.o != null)
      .map(c => c.sha256 -> c.o.lex).toMap

    assert(bySha("sha1") == KG + "entity/SparkContext")
    assert(bySha("sha2") == KG + "entity/SparkContext")
    assert(bySha("sha3") == KG + "entity/DataFrameWriter")
    assert(bySha("sha4") == KG + "entity/SparkSession")
    assert(!bySha.contains("sha5"), "garbage surface must stay unlinked")
    assert(bySha("sha9") == "x") // passthrough untouched (string literal)
    assert(linked.length == 5)
  }

  test("fuzzy linking is deterministic across runs") {
    import spark.implicits._
    val dict = spark.createDataset((0 until 50).map(e =>
      DictRow(f"${KG}entity/E$e%03d", f"E$e%03d_surface_name", 1.0)))
    val cands = spark.createDataset((0 until 30).map(k =>
      mention(f"E$k%03d_surface_nam", k))) // all 1 char off
    def run() = Linker.fuzzy(cands, dict).collect()
      .map(c => c.sha256 -> Option(c.o).map(_.lex).getOrElse("")).toMap
    val a = run(); val b = run()
    assert(a == b)
    assert(a.values.count(_.nonEmpty) >= 25, s"recall too low: $a")
  }
}
