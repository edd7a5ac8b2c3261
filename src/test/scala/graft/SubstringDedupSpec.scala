package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup

/** Exact-substring dedup (SURVEY §2.3 row 43m — Lee et al. 2022's
  * ExactSubstr tier): every ≥L-token window occurring more than once
  * corpus-wide keeps only its first (doc_id, pos) occurrence.
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], l: Int) =
    TextDedup.substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", l)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq

  test("later occurrence of a repeated run is cut; first survives whole") {
    // Shared 5-token run "v w x y z" (L=4 → windows inside it repeat).
    val got = run(Seq(
      1L -> "a b c v w x y z d e",
      2L -> "p q v w x y z r s t"), l = 4)
    assert(got == Seq(
      (1L, "a b c v w x y z d e", 0L),
      (2L, "p q r s t", 5L)))
  }

  test("exact duplicate doc is fully erased; original untouched") {
    val got = run(Seq(
      1L -> "one two three four five six",
      2L -> "one two three four five six",
      3L -> "totally different text here now ok"), l = 4)
    assert(got == Seq(
      (1L, "one two three four five six", 0L),
      (2L, "", 6L),
      (3L, "totally different text here now ok", 0L)))
  }

  test("docs shorter than L tokens never dedup (no window fits)") {
    val got = run(Seq(1L -> "x y z", 2L -> "x y z"), l = 4)
    assert(got == Seq((1L, "x y z", 0L), (2L, "x y z", 0L)))
  }

  test("intra-doc repetition: second in-document occurrence is cut") {
    val got = run(Seq(1L -> "a b c d e f a b c d e f"), l = 4)
    // First "a b c d e f" kept, the repeat (positions 6-11) deleted.
    assert(got == Seq((1L, "a b c d e f", 6L)))
  }

  test("shifted copy still dedups (positional contract, unlike span grid)") {
    // Doc 2 embeds doc 1's text after a 3-token prefix — the fixed
    // 10-word span grid of spanDedup would share nothing.
    val body = "m n o p q r s t u v"
    val got = run(Seq(1L -> body, 2L -> s"x y z $body"), l = 4)
    assert(got == Seq((1L, body, 0L), (2L, "x y z", 10L)))
  }

  test("overlapping marked windows merge into one span (n_dropped exact)") {
    // Doc 2 repeats a 6-token run: windows at offsets 0,1,2 overlap and
    // must merge to a single 6-token deletion, not 3×L.
    val got = run(Seq(
      1L -> "k1 k2 k3 k4 k5 k6 pad1 pad2",
      2L -> "k1 k2 k3 k4 k5 k6 tail1 tail2"), l = 4)
    assert(got == Seq(
      (1L, "k1 k2 k3 k4 k5 k6 pad1 pad2", 0L),
      (2L, "tail1 tail2", 6L)))
  }

  test("plan: flagging is a partial-aggregable groupBy, not a gram window") {
    val docs = Seq(1L -> "a b c d e", 2L -> "a b c d e").toDF("doc_id", "text")
    val plan = TextDedup.substringDedup(docs, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    // One Window IS expected (per-doc island merge) but none may
    // partition by the gram — the hot-key sort the groupBy avoids.
    assert(!plan.contains("windowspecdefinition(gram"),
      s"gram-keyed window sort found:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial min") ||
      plan.contains("HashAggregate"),
      s"expected partial aggregation for first-occurrence:\n$plan")
  }
}
