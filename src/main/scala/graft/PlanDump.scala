package graft

import java.io.PrintWriter

import org.apache.spark.sql.execution.FormattedMode

/** Dev utility: dump `explain("formatted")` for named queries to
  * one file each — the optimization rounds' plan-evidence trail
  * (plans/r<N>/<query>_<tag>.txt, checked by the judge against the
  * claims in OPTIMIZATION_r<N>.md).
  *
  * `runMain graft.PlanDump <sfDir> <outDir> <tag> [q1,q2,...]`
  * (no list = every SparkEntry query). Building a query runs its
  * builder — e2e/streaming entries execute their landing-zone or
  * stream machinery before returning the frame — so a full dump is
  * a real (if small-SF) pass over the board; plans are the point,
  * not the timings.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = if (args.length > 2) args(2) else "before"
    val names: Seq[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.harness(cpus)
    new java.io.File(outDir).mkdirs()
    try names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        val w = new PrintWriter(s"$outDir/${name}_$tag.txt", "UTF-8")
        try w.println(txt) finally w.close()
        println(s"[plandump] $name ok")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[plandump] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      GraftSession.reclaimScratch(spark, drainMillis = 0)
    } finally spark.stop()
  }
}
