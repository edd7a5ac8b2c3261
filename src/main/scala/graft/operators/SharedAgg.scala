package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-query shared scan: N independent filtered grouped-aggregation
  * queries over the SAME source, planned as ONE scan + ONE shuffle.
  *
  * The classic OLAP shared-scan / multi-query optimization: each query's
  * group-by key set becomes one entry of a GROUPING SETS aggregation (the
  * union of all key sets is grouped once), and each query's row filter is
  * folded into its aggregates as conditional aggregation
  * (`sum(CASE WHEN filter THEN x END)`), so per-query WHERE clauses don't
  * need per-query scans. At 100 TB this is the difference between N passes
  * over the fact table and one: a nightly metrics sweep with 20 reports
  * reads the data once, and the single Exchange carries partial aggregates
  * (grouping-set-expanded, still tiny relative to the fact).
  *
  * Semantics match running each query alone: a group that no filtered row
  * of query `i` falls into exists only for OTHER queries' sets, so each
  * query carries a hidden `count(CASE WHEN filter THEN 1 END)` guard and
  * [[split]] drops its zero rows (a standalone `groupBy` would never have
  * produced that group). Grouping-set null-markers are disambiguated from
  * genuine NULL group values by `grouping_id`, never by looking at values.
  *
  * Cost note: every metric is evaluated for every grouping set, so the
  * aggregation does O(sets × metrics) work per row — the trade is more
  * CPU per row for N− 1 fewer scans+shuffles; for scan-bound fact sweeps
  * that is the right side of the trade.
  */
object SharedAgg {

  /** One aggregate of one query. `fn` ∈ sum | count | min | max | avg.
    * For cross-engine float discipline pass `value` already decimal-cast
    * (see `Q.dsum`) and cast the published column back to double.
    */
  case class Metric(alias: String, fn: String, value: Column)

  /** One query of the sweep: its group-by keys (possibly empty = global),
    * its row filter (`lit(true)` for none), its aggregates.
    */
  case class Spec(name: String, groupBy: Seq[String], filter: Column,
      metrics: Seq[Metric])

  private def applyFn(m: Metric, filter: Column): Column = {
    val v = when(filter, m.value)
    (m.fn match {
      case "sum"   => sum(v)
      case "count" => count(v)
      case "min"   => min(v)
      case "max"   => max(v)
      case "avg"   => avg(v)
      case other   => throw new IllegalArgumentException(s"unknown agg fn $other")
    }).as(m.alias)
  }

  /** The union of all specs' group columns, in first-appearance order —
    * this ordering defines the `grouping_id` bit positions.
    */
  private def allKeys(specs: Seq[Spec]): Seq[String] =
    specs.flatMap(_.groupBy).distinct

  /** The grouping_id value identifying `spec`'s grouping set: bit i is 1
    * when allKeys(i) is AGGREGATED (not grouped) in that set.
    */
  def gid(specs: Seq[Spec], spec: Spec): Long =
    allKeys(specs).foldLeft(0L)((acc, k) =>
      (acc << 1) | (if (spec.groupBy.contains(k)) 0L else 1L))

  /** One aggregated frame holding every query's result rows: the union of
    * group columns, `_gid` (grouping_id), and per-spec guarded metric
    * columns named `<spec>__<alias>` plus a `_guard_<spec>` row-count guard.
    * Exactly one scan of `df` and one aggregation Exchange.
    */
  def run(df: DataFrame, specs: Seq[Spec]): DataFrame = {
    require(specs.map(_.name).distinct.size == specs.size, "duplicate spec names")
    val keys = allKeys(specs)
    val sets = specs.map(_.groupBy).distinct
      .map(g => keys.filter(g.contains).map(col))
    val aggs = specs.flatMap { sp =>
      applyFn(Metric(s"_guard_${sp.name}", "count", lit(1)), sp.filter) +:
        sp.metrics.map(m => applyFn(m.copy(alias = s"${sp.name}__${m.alias}"), sp.filter))
    }
    df.groupingSets(sets, keys.map(col): _*)
      .agg(grouping_id().as("_gid"), aggs: _*)
  }

  /** Carve one query's standalone result back out of the shared frame. */
  def split(shared: DataFrame, specs: Seq[Spec], name: String): DataFrame = {
    val sp = specs.find(_.name == name)
      .getOrElse(throw new NoSuchElementException(name))
    shared
      .filter(col("_gid") === lit(gid(specs, sp)) && col(s"_guard_${sp.name}") > 0)
      .select(sp.groupBy.map(col) ++
        sp.metrics.map(m => col(s"${sp.name}__${m.alias}").as(m.alias)): _*)
  }
}
