package graft.golden

import org.apache.spark.sql.SparkSession

/** Ad-hoc survey driver: run manifests given as args, print one line per
 * case — used to triage which W3C suites the engine covers (the
 * ManifestSpec encodes the curated outcome). */
object GoldenMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-golden").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      // NestedColumnAliasing is quadratic in the number of nested-field
      // references; wide term-struct expression trees (value-space compare
      // over formatted arithmetic) make it burn minutes on W3C one-row
      // queries. Our scans read flat columns, so the rule buys nothing.
      .config("spark.sql.optimizer.expression.nestedPruning.enabled", "false")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "false")
      // golden tests run on 1–100 row fixtures: Janino compilation of the
      // wide term-struct expressions dominates wall clock (~12 s per
      // query), interpreted eval is instant — turn codegen off in THIS
      // harness session only (production sessions keep codegen)
      .config("spark.sql.codegen.wholeStage", "false")
      .config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var pass = 0; var fail = 0; var skip = 0
    args.foreach { m =>
      println(s"== $m")
      Manifest.load(m).foreach { e =>
        val t0 = System.nanoTime()
        val outcome = GoldenRunner.runManifest(spark, m, only = Some(e.name)).head.outcome
        val secs = (System.nanoTime() - t0) / 1e9
        val tag = if (secs > 2) f" [$secs%.1fs]" else ""
        outcome match {
          case GoldenRunner.Passed => pass += 1; println(s"  PASS  ${e.name}$tag")
          case GoldenRunner.Failed(d) =>
            fail += 1
            println(s"  FAIL  ${e.name}$tag: ${d.linesIterator.take(3).mkString(" // ")}")
          case GoldenRunner.Skipped(why) => skip += 1; println(s"  skip  ${e.name}: $why")
        }
      }
    }
    println(s"TOTAL pass=$pass fail=$fail skip=$skip")
    spark.stop()
  }
}
