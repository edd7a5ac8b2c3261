package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking that survives corpus scale.
  *
  * `Window.orderBy(...)` with no partition funnels the whole frame
  * through ONE task — the classic scale-killer for exact ntile/rank/
  * row_number. The distributed shape: a range shuffle partitions the
  * key space (partition i's keys all sort before partition i+1's),
  * a per-partition window ranks locally in parallel, and per-partition
  * COUNTS — one row per partition, bounded by the partition count, not
  * the data — turn local ranks into global ones via an exclusive-prefix
  * offset. The only single-partition pass left is the offset cumsum
  * over ≤ numShufflePartitions rows (the same recursion-floor discipline
  * as Pack.seqPack).
  */
object ScaleWindows {

  /** Add global rank 1..N by `sortCols`. `sortCols` must be a TOTAL
    * order (include a unique tiebreak column): range partitioning keeps
    * equal keys in one partition, so a total order guarantees no
    * cross-partition ties and the offsets compose exactly.
    */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
      out: String = "rank"): DataFrame = {
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
    val offsets = local.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }

  /** SQL NTILE(k) bucket for a global rank over `n` rows (NTILE
    * semantics exactly: the first n mod k buckets take the extra row).
    * Pure integer arithmetic — bit-identical across engines.
    */
  def ntileFromRank(rank: Column, n: Long, k: Int): Column = {
    val base = n / k
    val rem = n % k
    val big = base + 1
    val cut = rem * big
    // base == 0 (fewer rows than buckets): every rank is <= cut, so the
    // otherwise-branch never evaluates, but keep its divisor non-zero.
    val safeBase = math.max(base, 1L)
    // floor(x / y) == x DIV y for the non-negative ranks here, and all
    // quotients sit far below 2^53, so the double round-trip is exact.
    when(rank <= cut, floor((rank - 1) / lit(big)) + 1)
      .otherwise(lit(rem) + floor((rank - cut - 1) / lit(safeBase)) + 1)
      .cast("int")
  }
}
