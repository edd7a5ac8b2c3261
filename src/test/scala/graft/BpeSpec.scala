package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchHash
import graft.operators.Bpe

/** BPE trainer + applier contract (SURVEY.md §2.3 rows 37e/37h): trainer
  * determinism, count/encode agreement, and the lossless-decode property
  * the id scheme promises — decoding each id back to its symbol and
  * concatenating reproduces the tokenized text exactly.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the rat"),
    (3L, "low lower lowest slower slowest"),
    (4L, "ünïcode tëxt with ünïcode tökens"),
    (5L, "aaaa aaaa aaaa bbbb"),
    (6L, "the the the the the"))
    .toDF("doc_id", "text")

  test("train is deterministic and merges by frequency with lexicographic ties") {
    val words = Seq(("aaab", 10L), ("aab", 5L))
    val m1 = Bpe.train(words, 3)
    val m2 = Bpe.train(words, 3)
    assert(m1 == m2)
    // ("a","a") fires 2×10 + 1×5 = 25, the clear winner first.
    assert(m1.head == (("a", "a")))
  }

  test("train stops early when no pairs remain") {
    assert(Bpe.train(Seq(("a", 3L), ("b", 2L)), 10).isEmpty)
  }

  test("tokenCount equals encodeIds length on every document") {
    val merges = Bpe.trainFromCorpus(corpus, "text", numMerges = 20, maxWords = 100)
    val rows = corpus.select(
        Bpe.tokenCount(col("text"), merges).as("n"),
        size(Bpe.encodeIds(col("text"), merges)).as("m"))
      .as[(Long, Int)].collect()
    rows.foreach { case (n, m) => assert(n == m.toLong) }
  }

  test("encodeIds decodes losslessly back to the tokenized text") {
    val merges = Bpe.trainFromCorpus(corpus, "text", numMerges = 30, maxWords = 100)
    // Inverse of the id scheme: < 0x110000 → codepoint, else merge rank.
    val symOf: Long => String = {
      val merged = merges.zipWithIndex.map { case ((a, b), r) =>
        (0x110000L + r) -> (a + b) }.toMap
      id => if (id < 0x110000L) id.toChar.toString else merged(id)
    }
    val rows = corpus.select(col("text"),
        Bpe.encodeIds(col("text"), merges).as("ids"))
      .as[(String, Seq[Long])].collect()
    rows.foreach { case (text, ids) =>
      val decoded = ids.map(symOf).mkString
      assert(decoded == SketchHash.tokenize(text).mkString,
        s"lossless decode failed for: $text")
    }
  }

  test("merges actually compress: repeated words shrink toward one token") {
    val merges = Bpe.trainFromCorpus(corpus, "text", numMerges = 50, maxWords = 100)
    val n = corpus.filter(col("doc_id") === 6L)
      .select(Bpe.tokenCount(col("text"), merges)).as[Long].head()
    // "the" ×5: with ("t","h")+("th","e") learned, ≤ 5 tokens (vs 15 chars).
    assert(n <= 5L)
  }
}
