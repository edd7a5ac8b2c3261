package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the last right row at-or-before each left row") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:00")), // exactly at quote time → match
      (3L, "A", ts("2024-01-01 09:59:59")), // before any quote → null
      (4L, "B", ts("2024-01-01 10:00:10")),
      (5L, "C", ts("2024-01-01 10:00:10")) // key with no quotes → null
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:03"), 101.0),
      ("A", ts("2024-01-01 10:00:06"), 102.0),
      ("B", ts("2024-01-01 10:00:01"), 50.0)
    ).toDF("sym", "t", "px")

    val out = AsOf.join(trades, quotes, "sym", "sym", "t", "t")
      .select(col("trade_id"), col("px_r"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(101.0)) // 10:00:05 → quote at 10:00:03
    assert(out(2L).contains(100.0)) // equality included
    assert(out(3L).isEmpty)
    assert(out(4L).contains(50.0))
    assert(out(5L).isEmpty)
  }

  test("native as-of equals the window-composed formulation on real events") {
    val sfDir = "/root/testdata/sf0.001"
    val composed = SparkEntry.queries("q_asof_join")(spark, sfDir)
      .select("event_id", "signup_ts")
      .as[(Long, java.sql.Timestamp)].collect().toMap
    val native = SparkEntry.queries("q_asof_native")(spark, sfDir)
      .select("event_id", "signup_ts")
      .as[(Long, java.sql.Timestamp)].collect().toMap
    assert(native == composed && native.nonEmpty)
  }

  test("null keys and null timestamps match nothing but left rows survive") {
    val left = Seq((1L, Option(0L), Option(ts("2024-01-01 10:00:05"))),
      (2L, None: Option[Long], Option(ts("2024-01-01 10:00:05"))),
      (3L, Option(7L), None: Option[java.sql.Timestamp]))
      .toDF("id", "user_id", "ts")
    val right = Seq(
      (Option(0L), Option(ts("2024-01-01 10:00:00")), "k0"),
      (None: Option[Long], Option(ts("2024-01-01 09:00:00")), "nullkey"),
      (Option(7L), None: Option[java.sql.Timestamp], "nullts"))
      .toDF("user_id", "ts", "tag")
    val out = AsOf.join(left, right, "user_id", "user_id", "ts", "ts")
      .select(col("id"), col("tag_r")).as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("k0")) // real key-0 row matches only the real quote
    assert(out(2L).isEmpty) // null left key → no match, row kept
    assert(out(3L).isEmpty) // null left ts → no match, row kept
  }

  test("as-of output reports key clustering: same-key groupBy adds no exchange") {
    val trades = Seq((1L, "A", ts("2024-01-01 10:00:05"), 1.0)).toDF("id", "sym", "t", "x")
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 9.0)).toDF("sym", "t", "px")
    val agg = AsOf.join(trades, quotes, "sym", "sym", "t", "t")
      .groupBy("sym").count()
    agg.collect()
    // AQE plan strings repeat the tree under "== Initial Plan ==" — count
    // exchanges only in the final section.
    val plan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected only the 2 child shuffles, got $exchanges:\n$plan")
  }

  test("as-of self-join works (fresh expr-ids on the right side)") {
    val e = Seq((1L, 7L, ts("2024-01-01 10:00:00")), (2L, 7L, ts("2024-01-01 11:00:00")))
      .toDF("id", "user_id", "ts")
    val out = AsOf.join(e, e, "user_id", "user_id", "ts", "ts")
    assert(out.count() == 2) // each row at-of-joins itself or an earlier row
  }
}
