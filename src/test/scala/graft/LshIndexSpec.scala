package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LshIndex, TextDedup}
import graft.sources.Tables

class LshIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sfDir)

  test("persisted probe equals the in-memory incremental dedup") {
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val path = java.nio.file.Files.createTempDirectory("lshix").toString
    LshIndex.build(corpus, "doc_id", "text", path)
    val persisted = LshIndex.probe(spark, path, batch, "doc_id", "text",
        threshold = 0.3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val mem = TextDedup.minhashIncremental(corpus, batch, "doc_id", "text",
        threshold = 0.3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(persisted == mem)
    assert(persisted.nonEmpty, "synthetic corpus should produce collisions")
  }

  test("append: probe after incremental append equals a full rebuild") {
    val a = docs.filter(col("doc_id") < 300)
    val b = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    // cap high enough that no bucket crosses it — the regime where
    // append == rebuild is the contract (crossing buckets keep their
    // old rows under append but drop entirely under rebuild).
    val incr = java.nio.file.Files.createTempDirectory("lshix3").toString
    LshIndex.build(a, "doc_id", "text", incr, maxBucket = 1000)
    LshIndex.append(b, "doc_id", "text", incr)
    val full = java.nio.file.Files.createTempDirectory("lshix4").toString
    LshIndex.build(a.union(b), "doc_id", "text", full, maxBucket = 1000)
    val got = LshIndex.probe(spark, incr, batch, "doc_id", "text", threshold = 0.3)
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    val want = LshIndex.probe(spark, full, batch, "doc_id", "text", threshold = 0.3)
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(got == want)
    assert(got.nonEmpty, "cross-boundary duplicates should collide")
  }

  test("small-batch probe prunes index partitions via a static pb filter") {
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 497) // 3 docs
    val path = java.nio.file.Files.createTempDirectory("lshix2").toString
    LshIndex.build(corpus, "doc_id", "text", path)
    val probe = LshIndex.probe(spark, path, batch, "doc_id", "text")
    val plan = probe.queryExecution.executedPlan.toString
    // >10 literals makes the optimizer print INSET rather than IN.
    val pf = "PartitionFilters: \\[pb#\\d+ (?:IN \\(([^)]*)\\)|INSET ([^\\]]*))\\]".r
      .findFirstMatchIn(plan)
    assert(pf.isDefined, s"no static pb IN/INSET partition filter on the index scan:\n$plan")
    // 3 docs × 16 bands = at most 48 of the 16×64 = 1024 partitions.
    val probed = Option(pf.get.group(1)).getOrElse(pf.get.group(2)).split(",").length
    assert(probed > 0 && probed <= 48,
      s"expected ≤ 48 probed partitions for a 3-doc batch, got $probed")
  }
}
