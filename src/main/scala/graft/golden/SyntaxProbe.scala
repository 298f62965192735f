package graft.golden

/**
 * Dev harness: run syntax-only W3C manifests (Positive/NegativeSyntaxTest)
 * without a SparkSession — `runMain graft.golden.SyntaxProbe <manifest.ttl>...`
 * prints one line per failing case and a per-manifest tally. Used to triage
 * parser gaps before promoting a suite into ManifestSpec's golden gate.
 */
object SyntaxProbe {
  def main(args: Array[String]): Unit = {
    var pass = 0; var fail = 0; var skip = 0
    args.foreach { m =>
      var p = 0; var f = 0
      Manifest.load(m).foreach { e =>
        val pos = e.types.exists(t => t.contains("PositiveSyntax") || t.contains("PositiveUpdateSyntax"))
        val neg = e.types.exists(t => t.contains("NegativeSyntax") || t.contains("NegativeUpdateSyntax"))
        if (pos || neg) GoldenRunner.runSyntaxEntry(e, negative = neg) match {
          case GoldenRunner.Passed => p += 1
          case GoldenRunner.Failed(d) =>
            f += 1
            println(s"FAIL [$m] ${e.name}: ${d.take(160)}")
          case GoldenRunner.Skipped(r) => skip += 1; println(s"SKIP ${e.name}: $r")
        } else skip += 1
      }
      pass += p; fail += f
      println(s"== $m: $p pass, $f fail")
    }
    println(s"TOTAL: $pass pass, $fail fail, $skip skipped")
  }
}
