package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The digest-byte lane expressions must be BIT-IDENTICAL to the
  * portable hex formula `conv(substring(sha2(s,256), 1+8j, 8), 16, 10)
  * ::long` they replace — that formula is what every oracle SQL states
  * (sha256 hex prefix parsed base-16), so any divergence is a silent
  * oracle break, not a perf bug.
  */
class Sha256LanesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val samples = Seq(
    "", "a", "hello world", "0|three gram shingle",
    "3|tab\tand\nnewline", "Ünïcödé — 測試 🙂", "  leading spaces",
    "a" * 300, "null") ++ (0 until 64).map(i => s"seed$i|tok$i tok${i + 1}")

  test("sha256Lanes == conv(substring(sha2)) for every lane") {
    val df = samples.toDF("s")
      .withColumn("lanes", graft.functions.sha256Lanes(col("s")))
    val hexLanes = (0 until 8).map(j =>
      conv(substring(sha2(col("s"), 256), 1 + 8 * j, 8), 16, 10)
        .cast("long").as(s"h$j"))
    val rows = df.select((col("s") +: col("lanes") +: hexLanes): _*).collect()
    rows.foreach { r =>
      val lanes = r.getSeq[Long](1)
      assert(lanes.length == 8)
      (0 until 8).foreach { j =>
        assert(lanes(j) == r.getLong(2 + j),
          s"lane $j mismatch for input '${r.getString(0)}'")
      }
    }
  }

  test("sha256Lane == lane 0, null-safe") {
    val df = (samples.map(Option(_)) :+ None).toDF("s")
    val got = df.select(
        graft.functions.sha256Lane(col("s")).as("l0"),
        conv(substring(sha2(col("s"), 256), 1, 8), 16, 10).cast("long").as("h0"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("lanes are unsigned 32-bit (non-negative, < 2^32)") {
    val lanes = samples.toDF("s")
      .select(explode(graft.functions.sha256Lanes(col("s"))).as("l"))
      .as[Long].collect()
    assert(lanes.forall(l => l >= 0L && l <= 0xffffffffL))
  }
}
