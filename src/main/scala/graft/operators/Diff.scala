package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the migration/replication validation primitive:
  * given two versions of a table and a business key, classify every key as
  * added / removed / changed / unchanged and name the columns that moved.
  *
  * Complements `t_table_checksum` (which answers "are these snapshots
  * identical?" with one scalar): when the checksums disagree, the diff
  * answers "WHERE do they disagree?" row-by-row without ever collecting
  * either side.
  *
  * Scale shape: ONE full-outer shuffle join on the key — both sides
  * partition by the same key, every comparison is a codegen'd null-safe
  * equality on co-located rows, and the output is produced streaming from
  * the join. No window, no collect, no second pass; `summarize` folds the
  * per-row statuses with a plain partial-agg count. At 100 TB this is the
  * minimum possible data movement for a keyed diff (both sides must meet
  * on the key somewhere); bucketed snapshots (ScaleJoins.writeBucketed on
  * the key) drop even that exchange.
  */
object Diff {

  /** Row-level diff of `newDf` vs `oldDf` on `keys`.
    *
    * Returns keys..., `diff_status` ('added'|'removed'|'changed'|
    * 'unchanged'), `changed_cols` (comma-joined names of compare columns
    * that differ, '' unless status is 'changed'), `n_changed`.
    *
    * Comparison is null-safe (`<=>`): a null on exactly one side counts
    * as a change; null-on-both does not.
    */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*).alias("o")
    val n = newDf.select((keys ++ compareCols).map(col): _*).alias("n")
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    // Presence flags must come from non-null MARKERS, not from key
    // nullability: a legitimately-null key column would otherwise read
    // as "absent on this side".
    val joined = o.withColumn("__op", lit(1))
      .join(n.withColumn("__np", lit(1)), joinCond, "full_outer")
    val diffFlag: String => Column =
      c => !(col(s"o.$c") <=> col(s"n.$c"))
    val changedList = concat_ws(",",
      compareCols.map(c => when(diffFlag(c), lit(c))): _*)
    val nChanged = compareCols.map(c => when(diffFlag(c), 1).otherwise(0))
      .reduce(_ + _)
    val status = when(col("__op").isNull, lit("added"))
      .when(col("__np").isNull, lit("removed"))
      .when(nChanged > 0, lit("changed"))
      .otherwise(lit("unchanged"))
    joined.select(
      keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++ Seq(
        status.as("diff_status"),
        when(status === "changed", changedList).otherwise(lit(""))
          .as("changed_cols"),
        when(status === "changed", nChanged).otherwise(lit(0))
          .cast("long").as("n_changed")): _*)
  }

  /** Aggregate view: rows per diff_status (the four counts a migration
    * gate alerts on). */
  def summarize(diff: DataFrame): DataFrame =
    diff.groupBy(col("diff_status")).agg(count(lit(1)).as("n"))

  /** Partition-pruned diff — the shape that makes a keyed diff viable at
    * 100 TB when snapshots drift in a few partitions (the common case:
    * an incremental load touched last week, not last decade):
    *
    *   1. per-`partCol` order-independent checksums of BOTH sides (one
    *      narrow agg per side — no join, no wide shuffle);
    *   2. the drifted-partition list = checksum full-outer mismatch
    *      (partition-count-sized, broadcastable);
    *   3. the row-level [[tableDiff]] runs ONLY over drifted partitions
    *      — an `isin` literal filter both scans can push down to the
    *      source, so untouched partitions are never read into the join.
    *
    * Semantically transparent: returns exactly `tableDiff(...)` rows
    * (every added/removed/changed row lives in a drifted partition by
    * definition of the checksum; `drifted` caps the literal list so a
    * fully-divergent table degrades to the plain full diff rather than
    * an oversized plan).
    */
  def partitionPrunedDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String], partCol: String,
      maxDriftedLiteral: Int = 10000): DataFrame = {
    val cols = (keys :+ partCol) ++ compareCols
    def checksums(df: DataFrame): DataFrame = {
      val rowStr = concat_ws("|",
        cols.map(c => coalesce(col(c).cast("string"), lit("\\N"))): _*)
      df.select(col(partCol).as("__part"),
          conv(substring(sha2(rowStr, 256), 1, 8), 16, 10).cast("long").as("__h"))
        .groupBy(col("__part"))
        .agg(count(lit(1)).as("__n"), sum(col("__h")).as("__sum"))
    }
    val drifted = checksums(oldDf).alias("co")
      .join(checksums(newDf).alias("cn"),
        col("co.__part") <=> col("cn.__part"), "full_outer")
      .filter(col("co.__n").isNull || col("cn.__n").isNull ||
        col("co.__n") =!= col("cn.__n") || col("co.__sum") =!= col("cn.__sum"))
      .select(coalesce(col("co.__part"), col("cn.__part")).as("__part"))
      .limit(maxDriftedLiteral + 1)
      .collect().map(_.get(0))
    if (drifted.length > maxDriftedLiteral)
      tableDiff(oldDf, newDf, keys, compareCols)
    else if (drifted.isEmpty)
      tableDiff(oldDf.limit(0), newDf.limit(0), keys, compareCols)
    else {
      // A null partition value can drift too — isin() never matches null,
      // so it needs its own disjunct.
      val (nulls, vals) = drifted.partition(_ == null)
      val keepVals =
        if (vals.isEmpty) lit(false) else col(partCol).isin(vals.toIndexedSeq: _*)
      val keep = if (nulls.isEmpty) keepVals else keepVals || col(partCol).isNull
      tableDiff(oldDf.filter(keep), newDf.filter(keep), keys, compareCols)
    }
  }
}
