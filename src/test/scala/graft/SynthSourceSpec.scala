package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SynthSource

class SynthSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def synth(rows: Long, partitions: Int = 4) =
    spark.read.format("graft-synth")
      .option("rows", rows.toString).option("partitions", partitions.toString).load()

  test("deterministic rows, planned across the requested partitions") {
    val df = synth(1000, partitions = 8)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 8)
    // Determinism: same options → identical table.
    val a = df.orderBy("doc_id").collect()
    val b = synth(1000, partitions = 3).orderBy("doc_id").collect()
    assert(a.sameElements(b), "partitioning changed row content")
    assert(a.head.getString(3).nonEmpty)
  }

  test("doc_id range filters are PUSHED and avoid generating rows at the source") {
    SynthSource.generated.reset()
    val filtered = synth(100000).filter(col("doc_id") >= 500 && col("doc_id") < 600)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(doc_id,500)") &&
      plan.contains("LessThan(doc_id,600)"),
      s"filters not pushed into the scan:\n$plan")
    assert(filtered.count() == 100)
    // The pushdown narrowed the GENERATED range — not a post-scan drop of
    // 100k rows (allow the count's own evaluation overhead, not 1000x).
    assert(SynthSource.generated.sum() <= 400,
      s"source generated ${SynthSource.generated.sum()} rows for a 100-row slice")
    // Residual (non-doc_id) predicates still evaluate correctly post-scan.
    val res = synth(1000).filter(col("lang") === "en" && col("doc_id") < 100)
    assert(res.count() == res.collect().length)
  }

  test("aggregate pushdown: ungrouped count/min/max cost ZERO generated rows") {
    val df = synth(100000)
    SynthSource.generated.reset()
    val r = df.filter(col("doc_id") >= 10 && col("doc_id") < 50)
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("mn"),
        max(col("doc_id")).as("mx"))
    val row = r.collect()(0)
    assert(row.getLong(0) == 40L && row.getLong(1) == 10L && row.getLong(2) == 49L)
    // The whole answer came from range arithmetic — filters narrow
    // [lo, hi) first, then the closed form replies without synthesizing
    // a single row.
    assert(SynthSource.generated.sum() == 0,
      s"pushed aggregate still generated ${SynthSource.generated.sum()} rows")
    // Complete pushdown: no aggregate exec remains in the final plan.
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"aggregate not fully pushed:\n$plan")

    // Unsupported shapes (grouping, other columns) fall back to the
    // row-generating scan and stay correct.
    SynthSource.generated.reset()
    val grouped = df.filter(col("doc_id") < 100)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    assert(grouped.agg(sum(col("n"))).collect()(0).getLong(0) == 100L)
    assert(SynthSource.generated.sum() > 0)
  }

  test("limit and top-N pushdown: only the requested slice is generated") {
    val df = synth(100000)
    SynthSource.generated.reset()
    assert(df.limit(5).collect().length == 5)
    assert(SynthSource.generated.sum() <= 5,
      s"LIMIT 5 generated ${SynthSource.generated.sum()} rows")
    // top-N by doc_id DESC is the closed-form suffix, emitted in order
    SynthSource.generated.reset()
    val top = df.orderBy(col("doc_id").desc).limit(3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(99999L, 99998L, 99997L))
    assert(SynthSource.generated.sum() <= 3,
      s"TopN DESC generated ${SynthSource.generated.sum()} rows")
    // ascending top-N composes with a pushed range filter
    SynthSource.generated.reset()
    val asc = df.filter(col("doc_id") >= 100).orderBy("doc_id").limit(2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(asc == Seq(100L, 101L))
    assert(SynthSource.generated.sum() <= 2,
      s"TopN ASC generated ${SynthSource.generated.sum()} rows")
  }

  test("exact reported statistics: a narrowed slice broadcast-joins unhinted") {
    // Without SupportsReportStatistics a V2 relation defaults to an
    // unknown (huge) size and the join below plans sort-merge; with the
    // generator's exact post-pushdown stats the 50-row slice broadcasts.
    val dim = synth(100000).filter(col("doc_id") < 50).select("doc_id", "lang")
    val fact = spark.range(0, 10000).select(col("id").as("doc_id"))
    val j = fact.join(dim, "doc_id")
    assert(j.count() == 50)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"narrowed synth slice did not broadcast:\n$plan")
  }

  test("runtime filtering: a selective join narrows generation at execution") {
    val fact = synth(1000000)
    val dimDir = java.nio.file.Files.createTempDirectory("synth-dim").toString + "/d"
    Seq((10L, 1), (20L, 1), (30L, 2), (40L, 2))
      .toDF("doc_id", "flag").write.parquet(dimDir)
    // Same ratio-heuristic nudge as the DPP spec: at test scale the
    // stats-based benefit estimate rounds to zero.
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      SynthSource.generated.reset()
      val j = fact.join(
        spark.read.parquet(dimDir).filter(col("flag") === 1), "doc_id")
      assert(j.count() == 2)
      // The runtime In({10, 20}) arrived at the scan and collapsed the
      // generated range to its [10, 21) envelope — not a 1M-row sweep.
      assert(SynthSource.generated.sum() < 10000,
        s"runtime filter ignored: generated ${SynthSource.generated.sum()} rows")
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    }
  }

  test("column pruning reaches the reader: only requested fields synthesized") {
    val df = synth(500).select("doc_id", "lang")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("text"), s"text not pruned from scan:\n$plan")
    assert(df.distinct().count() == 500)
  }

  test("synth source feeds the curation operators end to end") {
    val docs = synth(2000).withColumnRenamed("doc_id", "doc_id")
    val packed = graft.operators.Pack.seqPack(docs, "doc_id", "text", capacity = 128)
    assert(packed.count() == 2000)
    val hh = docs.select(explode(split(col("text"), " ")).as("tok"))
      .agg(graft.functions.heavyHitters(col("tok"), 32).as("hh"))
      .select(explode(col("hh"))).count()
    assert(hh == 14L) // full 14-word vocabulary, sketch exact under capacity
  }
}
