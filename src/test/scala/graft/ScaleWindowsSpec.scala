package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleWindows
import graft.sources.Tables

/** ScaleWindows.withGlobalRank must equal the single-task
  * `row_number() OVER (ORDER BY ...)` while never moving data rows
  * through one partition: the base frame crosses a RANGE exchange, and
  * the only single-partition pass is the per-partition-count cumsum
  * (bounded by the shuffle-partition count, not the data).
  */
class ScaleWindowsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("withGlobalRank equals the global-order row_number") {
    val cust = Tables.customer(spark, sfDir)
    val keys = Seq(col("c_acctbal"), col("c_custkey"))
    val got = ScaleWindows.withGlobalRank(cust, keys, "rk")
      .select(col("c_custkey"), col("rk")).as[(Long, Long)].collect().toMap
    val want = cust
      .withColumn("rk", row_number().over(Window.orderBy(keys: _*)).cast("long"))
      .select(col("c_custkey"), col("rk")).as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got.values.min == 1L && got.values.max == got.size.toLong)
  }

  test("ntileFromRank matches SQL NTILE semantics, including n % k != 0") {
    val df = spark.range(1, 104).toDF("id") // 103 rows: 3 buckets of 21, 2 of 20... k=5
    val got = ScaleWindows.withGlobalRank(df, Seq(col("id")), "rk")
      .withColumn("b", ScaleWindows.ntileFromRank(col("rk"), 103L, 5))
      .select(col("id"), col("b")).as[(Long, Int)].collect().toMap
    val want = df.withColumn("b", ntile(5).over(Window.orderBy("id")))
      .select(col("id"), col("b")).as[(Long, Int)].collect().toMap
    assert(got == want)
  }

  test("plan: base rows cross a range exchange, never SinglePartition") {
    val cust = Tables.customer(spark, sfDir)
    val ranked = ScaleWindows.withGlobalRank(cust,
      Seq(col("c_acctbal"), col("c_custkey")), "rk")
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"base frame must be range-shuffled:\n$plan")
    // Exactly one SinglePartition exchange: the offsets cumsum, whose
    // input is the groupBy(__pid).count() aggregate (≤ #partitions rows).
    val singles = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singles == 1, s"only the bounded offsets pass may be single-partition:\n$plan")
  }
}
