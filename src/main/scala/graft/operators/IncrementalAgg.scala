package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view analog of the
  * reference's incremental-state ETL: keep a persisted per-key aggregate
  * current under batch arrivals WITHOUT ever re-scanning history.
  *
  * Each batch reduces to per-key PARTIALS (count/sum/min/max — all
  * associative+commutative; avg is published as sum/count), and partials
  * merge with the stored state by the same-shaped re-aggregation. Cost per
  * batch is O(batch) + a shuffle of |keys in batch| partial rows; the 100
  * TB history is never touched again. Sums go through decimal, so merge
  * order can never flip a bit and state equals the full recompute exactly.
  *
  * The persisted form reuses StreamOps' crash-recoverable staging swap
  * (write staging → rename), so a killed job never leaves a half-merged
  * state table.
  */
object IncrementalAgg {

  /** One maintained aggregate. `fn` ∈ count | sum | min | max.
    * Sum inputs are decimal-cast by the caller for exactness.
    */
  case class AggCol(alias: String, fn: String, value: Column)

  private def firstAgg(a: AggCol): Column = (a.fn match {
    case "count" => count(a.value)
    case "sum"   => sum(a.value)
    case "min"   => min(a.value)
    case "max"   => max(a.value)
    case other   => throw new IllegalArgumentException(s"unknown agg fn $other")
  }).as(a.alias)

  /** The merge side: counts merge by SUM, everything else by itself. */
  private def mergeAgg(a: AggCol): Column = (a.fn match {
    case "count" | "sum" => sum(col(a.alias))
    case "min"           => min(col(a.alias))
    case "max"           => max(col(a.alias))
  }).as(a.alias)

  /** Reduce one batch to per-key partial rows (state-shaped). */
  def partials(batch: DataFrame, keys: Seq[String], aggs: Seq[AggCol]): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(firstAgg(aggs.head), aggs.tail.map(firstAgg): _*)

  /** Merge batch partials into (optional) existing state. */
  def merge(state: Option[DataFrame], delta: DataFrame, keys: Seq[String],
      aggs: Seq[AggCol]): DataFrame = {
    val unioned = state.fold(delta)(_.unionByName(delta))
    unioned.groupBy(keys.map(col): _*)
      .agg(mergeAgg(aggs.head), aggs.tail.map(mergeAgg): _*)
  }

  /** Fold one batch into the persisted state table at `stateDir`. */
  def updateParquet(batch: DataFrame, stateDir: String, keys: Seq[String],
      aggs: Seq[AggCol]): Unit = {
    val delta = partials(batch, keys, aggs)
    graft.streaming.StreamOps.mergeIntoParquet(delta, stateDir) {
      (spark: SparkSession, targetExists: Boolean) =>
        val state = if (targetExists) Some(spark.read.parquet(stateDir)) else None
        merge(state, delta, keys, aggs)
    }
  }
}
