package graft.golden

/**
 * CLI over [[GoldenRunner.runRiotManifest]] — triage loop for the W3C RDF
 * parser suites (rdft: vocabulary). No SparkSession: the riot document
 * parsers are pure. `runMain graft.golden.RiotSuiteMain <manifest.ttl>...`
 */
object RiotSuiteMain {
  def main(args: Array[String]): Unit = {
    var (tp, tf, ts) = (0, 0, 0)
    args.foreach { m =>
      println(s"## $m")
      val results = GoldenRunner.runRiotManifest(m)
      results.foreach {
        case GoldenRunner.CaseResult(n, GoldenRunner.Passed) => println(s"PASS $n")
        case GoldenRunner.CaseResult(n, GoldenRunner.Skipped(r)) => println(s"SKIP $n — $r")
        case GoldenRunner.CaseResult(n, GoldenRunner.Failed(d)) =>
          println(s"FAIL $n\n  ${d.linesIterator.mkString("\n  ")}")
      }
      val p = results.count(_.outcome == GoldenRunner.Passed)
      val f = results.count(_.outcome.isInstanceOf[GoldenRunner.Failed])
      val s = results.count(_.outcome.isInstanceOf[GoldenRunner.Skipped])
      tp += p; tf += f; ts += s
      println(s"== $p passed, $f failed, $s skipped — $m")
    }
    println(s"== TOTAL $tp passed, $tf failed, $ts skipped")
  }
}
