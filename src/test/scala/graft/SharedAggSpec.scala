package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedAgg
import graft.operators.SharedAgg.{Metric, Spec}
import graft.sources.Tables

class SharedAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def specs = Seq(
    Spec("by_flag", Seq("l_returnflag"),
      col("l_shipdate") >= lit("1996-01-01").cast("timestamp"),
      Seq(Metric("sum_qty", "sum", col("l_quantity").cast("decimal(18,2)")),
        Metric("n", "count", lit(1)))),
    Spec("by_pair", Seq("l_returnflag", "l_linestatus"), lit(true),
      Seq(Metric("n", "count", lit(1)))),
    Spec("global", Seq.empty, col("l_discount") > 0.05,
      Seq(Metric("max_price", "max", col("l_extendedprice")))))

  test("each split equals the standalone groupBy it replaces") {
    val li = Tables.lineitem(spark, sfDir)
    val shared = SharedAgg.run(li, specs)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet

    val byFlag = SharedAgg.split(shared, specs, "by_flag")
    val direct = li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        count(lit(1)).as("n"))
    assert(rows(byFlag) == rows(direct))

    val byPair = SharedAgg.split(shared, specs, "by_pair")
    val directPair = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    assert(rows(byPair) == rows(directPair))

    val global = SharedAgg.split(shared, specs, "global")
    val directGlobal = li.filter(col("l_discount") > 0.05)
      .agg(max(col("l_extendedprice")).as("max_price"))
    assert(rows(global) == rows(directGlobal))
  }

  test("a group that exists only for OTHER specs' filters is dropped") {
    import spark.implicits._
    // Group "b" has no row passing by_even's filter; a standalone groupBy
    // over the filtered input would not emit it — neither must split.
    val df = Seq(("a", 2), ("a", 4), ("b", 1)).toDF("k", "v")
    val sp = Seq(
      Spec("by_even", Seq("k"), col("v") % 2 === 0,
        Seq(Metric("n", "count", lit(1)))),
      Spec("all", Seq("k"), lit(true), Seq(Metric("n", "count", lit(1)))))
    val shared = SharedAgg.run(df, sp)
    val even = SharedAgg.split(shared, sp, "by_even")
      .as[(String, Long)].collect().toSet
    assert(even == Set(("a", 2L)))
    val all = SharedAgg.split(shared, sp, "all")
      .as[(String, Long)].collect().toSet
    assert(all == Set(("a", 2L), ("b", 1L)))
  }

  test("N queries plan as ONE scan, no Expand on the fact, tiny second shuffle") {
    val li = Tables.lineitem(spark, sfDir)
    val shared = SharedAgg.run(li, specs)
    val plan = shared.queryExecution.executedPlan
    val planStr = plan.toString
    val scans = "Scan parquet".r.findAllIn(planStr).size
    assert(scans == 1, s"expected exactly 1 fact scan for 3 queries, got $scans:\n$planStr")
    // Two exchanges: fact partials on the union key set, then the tiny
    // summary re-shuffled for its grouping-sets pass.
    val exchanges = "Exchange".r.findAllIn(planStr).size
    assert(exchanges == 2, s"expected 2 shuffles (partials + summary), got $exchanges:\n$planStr")
    // The Expand (grouping sets) must sit ABOVE the level-1 aggregate,
    // i.e. multiply summary rows, never fact rows. The plan string prints
    // top-down (scan last; AQE hides children from collect()), so the
    // level-1 aggregate pair and the scan must all print BELOW the Expand.
    val lines = planStr.linesIterator.toSeq
    val expandAt = lines.indexWhere(_.contains("Expand"))
    assert(expandAt >= 0, s"no grouping-sets Expand found at all:\n$planStr")
    val aggsBelow = lines.drop(expandAt + 1).count(_.contains("HashAggregate"))
    assert(aggsBelow >= 2,
      s"Expand multiplies fact rows (level-1 agg pair not beneath it):\n$planStr")
    assert(lines.indexWhere(_.contains("Scan parquet")) > expandAt,
      s"scan prints above Expand — Expand is on the fact side:\n$planStr")
  }
}
