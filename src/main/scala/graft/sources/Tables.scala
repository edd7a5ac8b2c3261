package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * Each table is one parquet directory/file under the scale-factor dir;
  * reads go through the vectorized parquet reader with pushdown/pruning
  * left to Catalyst (no eager cache — at 100 TB these are scans, not
  * materializations).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` arrives in whatever parquet flavor the upstream writer
    * produced; normalize every variant to an instant (TimestampType):
    *  - TIMESTAMP(NANOS) — Spark only reads it as a raw long
    *    (`spark.sql.legacy.parquet.nanosAsLong=true`, set in
    *    Verify/Bench/tests). Exact integer division ns→µs — float
    *    division would lose precision above 2^53.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) — pandas/pyarrow
    *    tz-naive writers (the reference's own to_datetime output is
    *    tz-naive, transform.py:160-182) → Spark TIMESTAMP_NTZ. Cast to
    *    TimestampType under the UTC session preserves the wall clock
    *    and restores `unix_micros`/watermark compatibility.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
