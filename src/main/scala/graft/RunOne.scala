package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named query and print timing + plan.
  * `runMain graft.RunOne <name> <sfDir> [explain]`
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    // Same conf source as Bench/Verify: GraftSession.harness.
    val spark = GraftSession.harness(cpus)
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    // Warm pass (codegen/footers), then the timed steady-state pass —
    // mirrors Bench's measurement regime. `nowarm` skips the warm pass:
    // for spill-bound queries at probe scale the two-pass regime keeps
    // pass 1's shuffle files resident while pass 2 spills (the r10
    // sf100 ppjoin disk-kill) — single-pass is the honest regime there.
    if (!args.contains("nowarm")) df.count()
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[runone] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
