package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.golden.GoldenRunner

/**
 * SPARQL-CDTs gate over the reference's vendored composite-datatype
 * suites (jena-arq/testing/SPARQL-CDTs): cdt:List / cdt:Map literals,
 * the cdt: function library, FOLD/UNFOLD, value-based equality, and
 * blank nodes inside CDT literals — ~650 QueryEvaluationTests through
 * the same Parser → Compiler → compare pipeline as ManifestSpec.
 */
class CdtSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    s.conf.set("spark.sql.optimizer.expression.nestedPruning.enabled", "false")
    s.conf.set("spark.sql.optimizer.nestedSchemaPruning.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private val DIR = "/root/reference/jena-arq/testing/SPARQL-CDTs"

  private val suites: Seq[(String, Map[String, String])] = Seq(
    "list-functions" -> Map.empty,
    "map-functions" -> Map.empty,
    "fold" -> Map.empty,
    "unfold" -> Map.empty,
    "bnodes" -> Map.empty,
    "orderby" -> Map.empty)

  suites.foreach { case (dir, skips) =>
    test(s"SPARQL-CDTs $dir manifest") {
      val results = GoldenRunner.runManifest(spark, s"$DIR/$dir/manifest.ttl", skips)
      val failed = results.collect { case GoldenRunner.CaseResult(n, GoldenRunner.Failed(d)) =>
        s"$n: ${d.linesIterator.take(2).mkString(" // ")}" }
      assert(failed.isEmpty, s"${failed.size} failing cases:\n  " + failed.take(40).mkString("\n  "))
      assert(results.count(_.outcome == GoldenRunner.Passed) > 0)
    }
  }
}
