package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, TextStats}
import graft.sources.Tables

/** Cluster-balanced diversity sampling (SURVEY §2.3 row 36g) and the
  * tokenizer fertility report (37i).
  *
  * clusterSample's contract: per-cluster quota by ascending sha256 —
  * identical to the window-rank formulation (which the DuckDB oracle
  * replays) while executing through TopKAgg's bounded heaps.
  */
class DiversitySampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def seeds(emb: org.apache.spark.sql.DataFrame) =
    emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))

  test("clusterSample == window-rank reference; quota enforced; sparse clusters whole") {
    val emb = Tables.embeddings(spark, sfDir)
    val cap = 5
    val got = Similarity.clusterSample(emb, "vec_id", "embedding", seeds(emb), cap)
      .select(col("cid"), col("vec_id"), col("rk"))
      .as[(Long, Long, Long)].collect().toSet

    // Reference: same assignment, rank by (hash, id) window, keep <= cap.
    val assigned = Similarity.lloydAssign(emb, "vec_id", "embedding", seeds(emb))
      .select(col("id").as("vec_id"), col("cid"))
    val want = assigned.withColumn("h",
        conv(substring(sha2(concat(lit("cs|"), col("vec_id").cast("string")), 256),
          1, 12), 16, 10).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("cid").orderBy(col("h"), col("vec_id"))).cast("long"))
      .filter(col("rk") <= cap)
      .select(col("cid"), col("vec_id"), col("rk"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)

    // Quota: no cluster exceeds cap; clusters with <= cap members whole.
    val perCluster = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perCluster.values.forall(_ <= cap))
    val sizes = assigned.groupBy("cid").count()
      .as[(Long, Long)].collect().toMap
    sizes.foreach { case (cid, n) =>
      assert(perCluster.getOrElse(cid, 0) == math.min(n, cap.toLong).toInt,
        s"cluster $cid: ${perCluster.getOrElse(cid, 0)} kept of $n (cap $cap)")
    }
  }

  test("clusterSample plan: bounded-heap aggregate, no window over the corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    val plan = Similarity.clusterSample(emb, "vec_id", "embedding", seeds(emb), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"selection must run through the TopKAgg bounded heaps:\n$plan")
    assert(!plan.contains("Window"),
      s"no window sort may touch the corpus:\n$plan")
  }

  test("tokenizerFertility: integer ppm arithmetic on a hand example") {
    // en: "ab cd" -> 5 chars, 2 words, bpe pretokens: "ab"," cd" -> 2
    // fr: "a b!" x2 docs -> 4 chars/doc, 2 words, pretokens "a"," b","!" -> 3
    val docs = Seq(
      ("en", "ab cd"), ("fr", "a b!"), ("fr", "a b!")
    ).toDF("lang", "text")
    val got = TextStats.tokenizerFertility(docs)
      .orderBy("lang")
      .select("lang", "n_docs", "n_chars", "n_words", "n_bpe_tokens",
        "chars_per_tok_ppm", "toks_per_word_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("en", 1L, 5L, 2L, 2L, 2500000L, 1000000L),
      ("fr", 2L, 8L, 4L, 6L, 1333333L, 1500000L)))
  }

  test("tokenizerFertility: zero-token language yields NULL ppm, not an error") {
    // A language whose docs are all empty/whitespace has 0 BPE tokens;
    // the ppm divisions must NULL out identically to the oracle's
    // nullif guard (DuckDB's // raises on a bare divide-by-zero).
    val docs = Seq(("xx", ""), ("en", "ab cd")).toDF("lang", "text")
    val row = TextStats.tokenizerFertility(docs)
      .filter(col("lang") === "xx")
      .select("n_bpe_tokens", "chars_per_tok_ppm", "toks_per_word_ppm")
      .collect().head
    assert(row.getLong(0) == 0L)
    assert(row.isNullAt(1), "chars_per_tok_ppm must be NULL at 0 tokens")
  }
}
