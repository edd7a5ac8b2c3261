package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-query shared scan: N independent filtered grouped-aggregation
  * queries over the SAME source, planned as ONE scan + ONE shuffle.
  *
  * The classic OLAP shared-scan / multi-query optimization, in two
  * levels: the fact is grouped ONCE by the union of all queries' key sets
  * (each query's set is a subset, so its coarser result re-aggregates
  * from these partials — count/sum merge by sum, min/max by themselves),
  * with each query's row filter folded in as conditional aggregation
  * (`sum(CASE WHEN filter THEN x END)`); grouping sets then run over the
  * TINY level-1 summary to materialize every query's grouping. At 100 TB
  * this is the difference between N passes over the fact table and one —
  * and, versus fact-side GROUPING SETS, the difference between an Expand
  * multiplying every input row by |sets| before the partial agg and no
  * Expand on the fact at all (measured 2× on the CPU-bound decimal sweep).
  *
  * Semantics match running each query alone: a group that no filtered row
  * of query `i` falls into exists only for OTHER queries' sets, so each
  * query carries a hidden `count(CASE WHEN filter THEN 1 END)` guard and
  * [[split]] drops its zero rows (a standalone `groupBy` would never have
  * produced that group). Grouping-set null-markers are disambiguated from
  * genuine NULL group values by `grouping_id`, never by looking at values.
  */
object SharedAgg {

  /** One aggregate of one query. `fn` ∈ sum | count | min | max — the
    * re-aggregable (algebraic) functions; derive avg as sum/count. For
    * cross-engine float discipline pass `value` already decimal-cast
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
  /** `inputPartitions`: optional round-robin fan-out of the input before
    * the aggregation. The shared aggregate is CPU-heavy per input row
    * (every spec's conditional metrics × every grouping set) while its
    * input bytes can be tiny, so a small scan can plan 2-3 tasks that
    * serialize all that CPU (measured 3.6 s vs 0.8 s at 11 MB input on 32
    * cores). At real scale the scan's own parallelism suffices — leave
    * it None; set it only when input bytes/row-cost are pathologically
    * skewed the small way.
    */
  def run(df: DataFrame, specs: Seq[Spec],
      inputPartitions: Option[Int] = None): DataFrame = {
    require(specs.map(_.name).distinct.size == specs.size, "duplicate spec names")
    val keys = allKeys(specs)
    // Canonicalize (key-order) BEFORE distinct: two specs grouping by the
    // same keys in different Seq order must share one grouping set, or
    // split() would hand both specs every result row twice.
    val sets = specs.map(_.groupBy).map(g => keys.filter(g.contains)).distinct
      .map(_.map(col))
    // TWO-LEVEL aggregation, not grouping sets over the fact: level 1
    // groups by the UNION of all key sets (every spec's set is a subset,
    // so every coarser result is derivable by re-aggregation — count/sum
    // merge by sum, min/max by themselves). The fact is therefore scanned
    // once AND aggregated once — no Expand multiplying every input row by
    // |sets| before the partial agg, which at 100 TB is the difference
    // between shuffling |finest groups| partial rows and |sets|× the
    // map-side agg hash pressure. Grouping sets DO run — over the tiny
    // level-1 summary, where the Expand costs nothing. Caveat, deliberate:
    // if the union-key cardinality explodes (near-unique cross product),
    // the level-1 summary is itself large and fact-side grouping sets
    // would win; metric sweeps group by low-cardinality dimensions.
    val level1 = specs.flatMap { sp =>
      applyFn(Metric(s"_guard_${sp.name}", "count", lit(1)), sp.filter) +:
        sp.metrics.map(m =>
          applyFn(m.copy(alias = s"${sp.name}__${m.alias}"), sp.filter))
    }
    def mergeFn(alias: String, fn: String): Column = ((fn match {
      case "count" | "sum" => sum(col(alias))
      case "min"           => min(col(alias))
      case "max"           => max(col(alias))
      case other => throw new IllegalArgumentException(
        s"agg fn $other is not re-aggregable; use sum+count and derive")
    }): Column).as(alias)
    val level2 = specs.flatMap { sp =>
      mergeFn(s"_guard_${sp.name}", "count") +:
        sp.metrics.map(m => mergeFn(s"${sp.name}__${m.alias}", m.fn))
    }
    val in = inputPartitions.fold(df)(df.repartition)
    in.groupBy(keys.map(col): _*)
      .agg(level1.head, level1.tail: _*)
      .groupingSets(sets, keys.map(col): _*)
      .agg(grouping_id().as("_gid"), level2: _*)
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
