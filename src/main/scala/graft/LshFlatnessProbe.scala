package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.sources.Tables
import graft.streaming.StreamOps

/** Per-batch flatness probe for the streaming LSH gate (r14 verdict
  * item 6): drive the `documents` table through [[StreamOps.lshPairsSink]]
  * as N single-file micro-batches and print each batch's trigger wall
  * time — the r14 single-generation fold showed up as a sawtooth whose
  * teeth GREW with stream age (each fold re-wrote the full standing
  * corpus inside foreachBatch); the tiered fold bounds every tooth to
  * its tier. Also prints the cumulative fold input span
  * ([[StreamOps.lshFoldSpans]]) — O(N log N) under the tiered fold,
  * O(N²) under the r14 one.
  *
  * Usage: runMain graft.LshFlatnessProbe <sfDir> [nBatches] [compactEvery]
  *        [tierFanout]
  */
object LshFlatnessProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 24
    val compactEvery = if (args.length > 2) args(2).toInt else 4
    val fanout = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.harness(cpus)

    val scratch = java.nio.file.Files.createTempDirectory("graft-lshflat")
    val dropD = s"$scratch/drop"; val out = s"$scratch/out"
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // n mtime-ordered single-file drops — the StreamingSpec staging shape.
    val seen = scala.collection.mutable.Set.empty[String]
    (0 until n).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(n.toLong)) === i)
        .coalesce(1).write.mode("append").parquet(dropD)
      new java.io.File(dropD).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !seen(f.getName))
        .foreach { f =>
          require(f.setLastModified(1700000000000L + i * 60000L), s"mtime: $f")
          seen += f.getName
        }
    }

    val durations = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val d = e.progress.durationMs.getOrDefault("triggerExecution", -1L)
        if (e.progress.batchId >= 0 && d >= 0)
          durations.put(e.progress.batchId, d)
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    StreamOps.lshFoldSpans.remove(out)
    val t0 = System.nanoTime()
    val src = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(dropD)
    StreamOps.lshPairsSink(src, out, s"$scratch/ckpt",
      compactEvery = compactEvery, tierFanout = fanout).awaitTermination()
    val total = (System.nanoTime() - t0) / 1e9

    val rows = StreamOps.lshPairsRead(spark, out).count()
    import scala.jdk.CollectionConverters._
    val perBatch = durations.asScala.toSeq.sortBy(_._1)
    perBatch.foreach { case (b, ms) =>
      println(f"[lshflat] batch=$b%3d trigger=${ms / 1000.0}%.2fs")
    }
    val ds = perBatch.map(_._2)
    val spans = StreamOps.lshFoldSpans.getOrElse(out, 0L)
    val quadratic = compactEvery.toLong *
      (1L to (n - 1).toLong / compactEvery).sum // r14 full-rewrite spans
    println(f"[lshflat] n=$n compactEvery=$compactEvery fanout=$fanout " +
      f"total=$total%.1fs rows=$rows " +
      f"batchMin=${ds.min / 1000.0}%.2fs batchMed=${ds.sorted.apply(ds.size / 2) / 1000.0}%.2fs " +
      f"batchMax=${ds.max / 1000.0}%.2fs foldSpans=$spans (r14-shape=$quadratic)")
    spark.stop()
  }
}
