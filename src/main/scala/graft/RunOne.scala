package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Dev utility: run one named query and print timing + plan.
  * `runMain graft.RunOne <name> <sfDir> [explain] [nowarm] [metrics]`
  */
object RunOne {

  /** Sums task-level executor metrics across the timed pass. Wall time
    * on a loaded host swings with ambient CPU contention (the r15
    * starvation-wave host-days measured consecutive identical runs
    * 10-80× apart); executor CPU seconds and shuffle bytes are
    * load-invariant, so interleaved A/Bs adjudicate on these.
    */
  private final class MetricsListener extends SparkListener {
    val cpuNs = new LongAdder; val runNs = new LongAdder
    val shufWrite = new LongAdder; val shufRead = new LongAdder
    val spillDisk = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        cpuNs.add(m.executorCpuTime); runNs.add(m.executorRunTime * 1000000L)
        shufWrite.add(m.shuffleWriteMetrics.bytesWritten)
        shufRead.add(m.shuffleReadMetrics.totalBytesRead)
        spillDisk.add(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { cpuNs.reset(); runNs.reset(); shufWrite.reset()
      shufRead.reset(); spillDisk.reset() }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    // Same conf source as Bench/Verify: GraftSession.harness.
    val spark = GraftSession.harness(cpus)
    val listener = if (args.contains("metrics")) {
      val l = new MetricsListener; spark.sparkContext.addSparkListener(l); Some(l)
    } else None
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    // Warm pass (codegen/footers), then the timed steady-state pass —
    // mirrors Bench's measurement regime. `nowarm` skips the warm pass:
    // for spill-bound queries at probe scale the two-pass regime keeps
    // pass 1's shuffle files resident while pass 2 spills (the r10
    // sf100 ppjoin disk-kill) — single-pass is the honest regime there.
    if (!args.contains("nowarm")) df.count()
    // The listener bus is async (and private[spark]); a short drain
    // beat before reading/resetting the adders is enough for a
    // measurement tool — task-end events trail the action by ms.
    listener.foreach { l => Thread.sleep(500); l.reset() }
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[runone] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    listener.foreach { l =>
      Thread.sleep(500)
      println(f"[metrics] $name cpu=${l.cpuNs.sum / 1e9}%.2fs run=${l.runNs.sum / 1e9}%.2fs " +
        f"shufW=${l.shufWrite.sum / 1e6}%.1fMB shufR=${l.shufRead.sum / 1e6}%.1fMB " +
        f"spill=${l.spillDisk.sum / 1e6}%.1fMB")
    }
    spark.stop()
  }
}
