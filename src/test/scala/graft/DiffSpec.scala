package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Diff

class DiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k")
      .select("k", "diff_status", "changed_cols", "n_changed")
      .as[(java.lang.Long, String, String, Long)].collect().toSeq

  test("tableDiff classifies added/removed/changed/unchanged with null-safe compares") {
    val oldDf = Seq[(java.lang.Long, String, java.lang.Integer)](
      (1L, "a", 10), // unchanged
      (2L, "b", 20), // changed: value 20 -> 21
      (3L, "c", null), // unchanged (null on both sides is NOT a change)
      (4L, "d", 40), // changed: value 40 -> null (null on ONE side is)
      (5L, "e", 50) // removed
    ).toDF("k", "name", "value")
    val newDf = Seq[(java.lang.Long, String, java.lang.Integer)](
      (1L, "a", 10),
      (2L, "b", 21),
      (3L, "c", null),
      (4L, "d", null),
      (6L, "f", 60) // added
    ).toDF("k", "name", "value")

    val out = rows(Diff.tableDiff(oldDf, newDf, Seq("k"), Seq("name", "value")))
    assert(out == Seq(
      (1L: java.lang.Long, "unchanged", "", 0L),
      (2L: java.lang.Long, "changed", "value", 1L),
      (3L: java.lang.Long, "unchanged", "", 0L),
      (4L: java.lang.Long, "changed", "value", 1L),
      (5L: java.lang.Long, "removed", "", 0L),
      (6L: java.lang.Long, "added", "", 0L)))
  }

  test("changed_cols names every drifted column in compare order") {
    val oldDf = Seq((1L, "x", 1.0, "p")).toDF("k", "name", "value", "props")
    val newDf = Seq((1L, "y", 2.0, "p")).toDF("k", "name", "value", "props")
    val out = Diff.tableDiff(oldDf, newDf, Seq("k"), Seq("name", "value", "props"))
      .select("changed_cols", "n_changed").as[(String, Long)].head()
    assert(out == (("name,value", 2L)))
  }

  test("summarize folds statuses; composite keys join on all parts") {
    val oldDf = Seq((1L, "a", 1), (1L, "b", 2), (2L, "a", 3)).toDF("k1", "k2", "v")
    val newDf = Seq((1L, "a", 1), (1L, "b", 9), (3L, "a", 4)).toDF("k1", "k2", "v")
    val d = Diff.tableDiff(oldDf, newDf, Seq("k1", "k2"), Seq("v"))
    val m = Diff.summarize(d).as[(String, Long)].collect().toMap
    assert(m == Map("unchanged" -> 1L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
  }

  test("partitionPrunedDiff equals the plain diff and prunes clean partitions") {
    val oldDf = Seq(
      (1L, "p1", "a"), (2L, "p1", "b"), // p1 untouched
      (3L, "p2", "c"), (4L, "p2", "d"), // p2: row 4 changes
      (5L, "p3", "e") // p3: row 5 removed, row 6 added
    ).toDF("k", "part", "v")
    val newDf = Seq(
      (1L, "p1", "a"), (2L, "p1", "b"),
      (3L, "p2", "c"), (4L, "p2", "D2"),
      (6L, "p3", "f")
    ).toDF("k", "part", "v")

    val plain = rows(Diff.tableDiff(oldDf, newDf, Seq("k"), Seq("v")))
    val pruned = rows(
      Diff.partitionPrunedDiff(oldDf, newDf, Seq("k"), Seq("v"), "part"))
    // Transparent up to the rows the pruning legitimately skips: clean
    // partitions produce only 'unchanged' rows.
    assert(pruned.filter(_._2 != "unchanged") == plain.filter(_._2 != "unchanged"))
    // p1 was pruned: its keys never reach the row diff.
    assert(!pruned.exists(r => r._1 == 1L || r._1 == 2L))
  }

  test("partitionPrunedDiff: no drift → empty; null partitions still diff") {
    val same = Seq((1L, "p1", "x")).toDF("k", "part", "v")
    assert(Diff.partitionPrunedDiff(same, same, Seq("k"), Seq("v"), "part")
      .count() == 0L)

    val oldN = Seq[(java.lang.Long, String, String)]((1L, null, "x"))
      .toDF("k", "part", "v")
    val newN = Seq[(java.lang.Long, String, String)]((1L, null, "y"))
      .toDF("k", "part", "v")
    val out = rows(Diff.partitionPrunedDiff(oldN, newN, Seq("k"), Seq("v"), "part"))
    assert(out == Seq((1L: java.lang.Long, "changed", "v", 1L)))
  }

  test("the diff join carries no extra shuffle beyond the keyed exchange") {
    val oldDf = Seq((1L, "a")).toDF("k", "v")
    val newDf = Seq((1L, "a")).toDF("k", "v")
    val plan = Diff.tableDiff(oldDf, newDf, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    // One SortMergeJoin FullOuter (or BHJ at this size) and no Window /
    // extra aggregation in the row-level diff.
    assert(!plan.contains("Window"))
  }
}
