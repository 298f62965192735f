package graft.bench

import org.apache.spark.sql.SparkSession

import graft.pipeline.Pipeline

/**
 * North-rule scaling evidence (BASELINE.json: "throughput scaling
 * efficiency ≥ 0.8 from N to 4N executors"). No real cluster exists in
 * this sandbox, so the sanctioned protocol (BASELINE.md) is: run the
 * IDENTICAL end-to-end pipeline job on the IDENTICAL input at local[N]
 * and local[4N], report triples/sec at both and
 *
 *   efficiency = (throughputᴺ⁴ / throughputᴺ) / 4.
 *
 * Each run uses a fresh SparkSession (fresh scheduler + shuffle state) and
 * a fresh output dir (no resume short-circuit). shuffle.partitions scales
 * with cores, as a real deployment would configure it.
 *
 * Usage: runMain graft.bench.ScalingBench [nRepos] [filesPerRepo] [outBase]
 */
object ScalingBench {

  final case class RunResult(cpus: Int, triples: Long, wallSec: Double) {
    def throughput: Double = triples / wallSec
  }

  def runAt(cpus: Int, nRepos: Int, filesPerRepo: Int, outDir: String): RunResult = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t0 = System.nanoTime()
      val triples = Pipeline.runFused(spark, nRepos, filesPerRepo, outDir)
      val wall = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, triples, wall)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nRepos = if (args.length > 0) args(0).toInt else 2000
    val filesPerRepo = if (args.length > 1) args(1).toInt else 40
    val outBase = if (args.length > 2) args(2) else "/tmp/graft_scaling"
    // N defaults to 2 (→ 4N = 8): a fixed-total-work CPU probe on this VM
    // (BASELINE.md "hardware envelope") shows 32 advertised vCPUs deliver
    // only ~8-10 effective cores (12-21%% hypervisor steal; 8→32 threads
    // speeds pure CPU work by just 1.31x), so 2→8 is the largest 4x step
    // that stays inside the machine's linear-scaling region.
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2").toInt

    // warm-up at 4N on a tiny corpus: JIT + parquet codec init off the clock
    runAt(4 * n, 20, 5, s"$outBase/warmup")

    val r4n = runAt(4 * n, nRepos, filesPerRepo, s"$outBase/c${4 * n}")
    val rn = runAt(n, nRepos, filesPerRepo, s"$outBase/c$n")
    val eff = (r4n.throughput / rn.throughput) / 4.0
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_cpus":$n,"4n_cpus":${4 * n},"triples":${r4n.triples},"throughput_n":${rn.throughput}%.0f,"throughput_4n":${r4n.throughput}%.0f,"wall_n":${rn.wallSec}%.1f,"wall_4n":${r4n.wallSec}%.1f}""")
  }
}
