package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir
import graft.sources.Tables

/** Float-side invariants of the DSIR stages (the integer feature stage
  * is hash-checked by the x_dsir_features oracle).
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sfDir)

  test("feature buckets are dense longs in [0, numBuckets)") {
    val f = Dsir.features(docs, "doc_id", "text", numBuckets = 512)
    val (mn, mx, nulls) = f.agg(min("bucket"), max("bucket"),
      sum(when(col("bucket").isNull || col("cnt").isNull, 1).otherwise(0)))
      .as[(Long, Long, Long)].head()
    assert(mn >= 0L && mx < 512L && nulls == 0L)
  }

  test("weights fit on an en target rank en docs above non-en docs") {
    val raw = Dsir.features(docs, "doc_id", "text")
    val ratios = Dsir.bucketLogRatio(
      Dsir.features(docs.filter(col("lang") === "en"), "doc_id", "text"),
      raw, numBuckets = 4096)
    val w = Dsir.importanceWeights(raw, ratios)
      .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
    val Array(enAvg, otherAvg) = w
      .withColumn("is_en", col("lang") === "en")
      .groupBy(col("is_en")).agg(avg("log_w").as("aw"))
      .orderBy(col("is_en").desc)
      .select(col("aw")).as[Double].collect()
    assert(enAvg > otherAvg,
      s"target-fit weights must enrich the target language: en=$enAvg other=$otherAvg")
  }

  test("resample is deterministic and top-k compiles to TakeOrdered") {
    val q = SparkEntry.queries("x_dsir_select")
    val a = q(spark, sfDir).collect().toSeq
    val b = q(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.size == 100)
    val plan = q(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"Gumbel top-k must be TakeOrdered, not a global sort:\n$plan")
  }

  test("stateless scorer equals the join+agg weights on the same corpus") {
    val raw = Dsir.features(docs, "doc_id", "text")
    val ratios = Dsir.bucketLogRatio(
      Dsir.features(docs.filter(col("lang") === "en"), "doc_id", "text"),
      raw, numBuckets = 4096)
    val joined = Dsir.importanceWeights(raw, ratios)
      .select(col("id"), col("log_w")).as[(Long, Double)].collect().toMap
    val stateless = Dsir.scoreStateless(docs, "doc_id", "text",
        Dsir.collectModel(ratios))
      .select(col("doc_id"), col("dsir_score")).as[(Long, Double)].collect().toMap
    assert(stateless.keySet == joined.keySet)
    // Same terms, different summation order (fold vs partial aggs) —
    // equality up to float accumulation.
    joined.foreach { case (id, w) =>
      assert(math.abs(stateless(id) - w) <= 1e-9 * math.max(1.0, math.abs(w)),
        s"doc $id: stateless ${stateless(id)} vs joined $w")
    }
  }

  test("streaming dsirGate passes exactly the docs the batch gate passes") {
    val raw = Dsir.features(docs, "doc_id", "text")
    val model = Dsir.collectModel(Dsir.bucketLogRatio(
      Dsir.features(docs.filter(col("lang") === "en"), "doc_id", "text"),
      raw, numBuckets = 4096))
    // Median-ish threshold so the gate genuinely splits the corpus.
    val thr = Dsir.scoreStateless(docs, "doc_id", "text", model)
      .agg(expr("percentile_approx(dsir_score, 0.5, 1000)")).as[Double].head()
    val dropDir = java.nio.file.Files.createTempDirectory("graft-dsir-in").toString
    docs.select("doc_id", "text").coalesce(2).write.mode("append").parquet(dropDir)
    val src = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(dropDir)
    val q = graft.streaming.StreamOps.dsirGate(src, model, thr)
      .writeStream.format("memory").queryName("dsir_gate")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("dsir_gate").select("doc_id").as[Long].collect().toSet
    val batch = Dsir.scoreStateless(docs.select("doc_id", "text"), "doc_id", "text", model)
      .filter(col("dsir_score") >= thr).select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.size < 500) // the gate actually gates
  }

  test("a different salt draws a different sample, same weight model") {
    val raw = Dsir.features(docs, "doc_id", "text")
    val ratios = Dsir.bucketLogRatio(
      Dsir.features(docs.filter(col("lang") === "en"), "doc_id", "text"),
      raw, numBuckets = 4096)
    val w = Dsir.importanceWeights(raw, ratios)
    val s1 = Dsir.resample(w, 50, "salt-a").select("id").as[Long].collect().toSet
    val s2 = Dsir.resample(w, 50, "salt-b").select("id").as[Long].collect().toSet
    assert(s1 != s2)
    assert((s1 & s2).nonEmpty) // high-weight docs survive either draw
  }
}
