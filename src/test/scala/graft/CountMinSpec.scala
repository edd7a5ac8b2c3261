package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{countMin, CountMinAgg}

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Depth = 4
  private val Width = 64

  // Zipf-ish corpus: item i appears (101 - i) times, 100 distinct items —
  // guaranteed collisions at width 64.
  private lazy val items = (1 to 100).flatMap(i => Seq.fill(101 - i)(s"item_$i"))
  private lazy val df = items.toDF("tok")

  private def estimates(parts: Int) = {
    val sk = df.repartition(parts).agg(countMin(col("tok"), Depth, Width).as("sk"))
    df.distinct().crossJoin(broadcast(sk))
      .select(col("tok"),
        CountMinAgg.estimate(col("sk"), col("tok"), Depth, Width).as("est"))
      .as[(String, Long)].collect().toMap
  }

  test("estimates are one-sided (est >= exact) and bounded on a colliding grid") {
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = estimates(parts = 8)
    val n = items.size.toLong
    exact.foreach { case (tok, c) =>
      assert(est(tok) >= c, s"$tok underestimated: ${est(tok)} < $c")
    }
    // With depth 4 the expected overshoot is ~2N/width per row; allow 4x
    // headroom — this is a determinism-pinned dataset, not a tail bound.
    val maxOver = exact.map { case (tok, c) => est(tok) - c }.max
    assert(maxOver <= 8 * n / Width, s"overshoot $maxOver too large")
  }

  test("merge is exactly associative: any partitioning yields the identical sketch") {
    val a = df.repartition(1).agg(countMin(col("tok"), Depth, Width)).head.getStruct(0)
    val b = df.repartition(13).agg(countMin(col("tok"), Depth, Width)).head.getStruct(0)
    assert(a.getLong(0) == b.getLong(0))
    assert(a.getSeq[Long](1) == b.getSeq[Long](1))
  }

  test("total and grid mass agree: each row of the grid sums to total") {
    val sk = df.agg(countMin(col("tok"), Depth, Width)).head.getStruct(0)
    val total = sk.getLong(0)
    val grid = sk.getSeq[Long](1)
    assert(total == items.size.toLong)
    (0 until Depth).foreach { r =>
      assert(grid.slice(r * Width, (r + 1) * Width).sum == total)
    }
  }

  test("count_min is SQL-registered via GraftExtensions") {
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("cm_toks")
    val row = spark.sql(
      s"SELECT count_min(tok, $Depth, $Width) AS sk FROM cm_toks").head.getStruct(0)
    assert(row.getLong(0) == items.size.toLong)
  }
}
