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

  test("N queries plan as ONE scan and ONE aggregation exchange") {
    val li = Tables.lineitem(spark, sfDir)
    val shared = SharedAgg.run(li, specs)
    val plan = shared.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly 1 fact scan for 3 queries, got $scans:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly 1 shuffle (partial-agg'd grouping sets), got $exchanges:\n$plan")
  }
}
