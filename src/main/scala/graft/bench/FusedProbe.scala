package graft.bench

/**
 * Single-leg diagnostic for the scaling protocol: run the fused pipeline
 * ONCE at a given core count and print the wall + the per-phase laps that
 * `Pipeline.runFused` emits. Used to decompose the fixed driver term F of
 * the `wall = F + W/c` model (BASELINE.md trial 10) without paying a full
 * ABBA trial.
 *
 * Usage: runMain graft.bench.FusedProbe <cpus> [nRepos] [filesPerRepo] [outDir]
 */
object FusedProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 4
    val nRepos = if (args.length > 1) args(1).toInt else 40000
    val filesPerRepo = if (args.length > 2) args(2).toInt else 40
    val outDir = if (args.length > 3) args(3) else "/dev/shm/graft_fused_probe"
    // same tiny warmup as the protocol: JIT + codec init off the clock;
    // laps enabled only AFTER it so the real leg's lap lines stand alone
    ScalingBench.runAt(cpus, 20, 5, s"$outDir/warmup")
    sys.props("graft.laps") = "1"
    val r = ScalingBench.runAt(cpus, nRepos, filesPerRepo, s"$outDir/leg_c$cpus")
    println(f"""{"probe":"fused_leg","cpus":$cpus,"triples":${r.triples},"wall":${r.wallSec}%.1f,"throughput":${r.throughput}%.0f}""")
  }
}
