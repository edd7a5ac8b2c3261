package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over plain DataFrames — undirected edge
  * lists (u, v), u < v canonical. Complements the iterative operators
  * (DedupResolve components, fixed-point PageRank) with the
  * neighborhood-structure family: triangles, clustering coefficients,
  * k-core peeling.
  *
  * Scale notes:
  *  - [[orientedEdges]] directs every edge from its (degree, id)-smaller
  *    endpoint to the larger. Out-degrees under this orientation are
  *    O(sqrt(|E|)) on ANY graph (arboricity bound), so the wedge join in
  *    [[triangles]] is O(|E|^1.5) worst-case instead of
  *    sum-of-squared-degrees — the difference between feasible and
  *    explosive on a power-law web/link graph.
  *  - Everything is equi-joins + keyed aggs: AQE-skew-splittable, no
  *    driver state, no windows over data-sized frames.
  */
object Graphs {

  /** Canonical undirected co-occurrence edges from (group, member) rows:
    * two members are adjacent iff they share a group. Fan-out per group
    * is C(k, 2) — callers must ensure group sizes are bounded (e.g.
    * lineitems per order ≤ 7) or pre-cap them.
    *
    * Plan (r12): per-group `collect_set` + an in-row pair expansion —
    * ONE shuffle to group plus one shuffle to dedup/weight the pairs.
    * The previous shape (distinct on (g, m), self-join on g, distinct)
    * re-shuffled the member frame three times and materialized the
    * per-group pair fan-out through a join; the collect_set groupBy
    * dedups (g, m) for free in its aggregation buffer, and the pair
    * explode is a codegen'd nested `transform` over the ≤ k-element
    * sorted member array — map-side, no join. The r11 sf100 probes put
    * the distinct+self-join build at 1.5-1.8× linear on
    * q_triangle_count/q_kcore; this collapses exactly that cost.
    */
  def cooccurrenceEdges(df: DataFrame, groupCol: String, memberCol: String): DataFrame =
    groupPairs(df, groupCol, memberCol).distinct()

  /** Weighted co-occurrence edges: (u, v, w) with w = the number of
    * groups the pair shares (u < v canonical). Same one-groupBy + one
    * pair-explode plan as [[cooccurrenceEdges]]; the weight agg IS the
    * dedup shuffle, so the weighting is free.
    */
  def cooccurrenceWeightedEdges(df: DataFrame, groupCol: String,
      memberCol: String): DataFrame =
    groupPairs(df, groupCol, memberCol)
      .groupBy("u", "v").agg(count(lit(1)).as("w"))

  /** One (u, v) row per (group, unordered member pair): collect each
    * group's distinct members sorted, expand the C(k, 2) pairs in-row
    * (u < v by the sort). Output is NOT pair-distinct across groups —
    * callers aggregate or distinct it.
    */
  private def groupPairs(df: DataFrame, groupCol: String,
      memberCol: String): DataFrame =
    df.select(col(groupCol).as("g"), col(memberCol).as("m"))
      .groupBy("g").agg(sort_array(collect_set(col("m"))).as("ms"))
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + lit(2), size(col("ms")) - i - 1),
          y => struct(x.as("u"), y.as("v")))))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))

  /** (node, deg) for a canonical undirected edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** Orient each edge low→high by the (deg, id) total order. Returns
    * (src, dst, dord) where dord is the destination's order key — the
    * wedge join needs it to emit each out-neighbor pair once.
    * `idSpan` must exceed every node id so ord = deg * idSpan + id is a
    * strict total order.
    */
  def orientedEdges(edges: DataFrame, idSpan: Long = 1L << 20): DataFrame = {
    val ord = degrees(edges).select(col("node"),
      (col("deg") * lit(idSpan) + col("node")).as("ord"))
    edges
      .join(ord.select(col("node").as("u"), col("ord").as("ou")), "u")
      .join(ord.select(col("node").as("v"), col("ord").as("ov")), "v")
      .select(
        when(col("ou") < col("ov"), col("u")).otherwise(col("v")).as("src"),
        when(col("ou") < col("ov"), col("v")).otherwise(col("u")).as("dst"),
        greatest(col("ou"), col("ov")).as("dord"))
  }

  /** Each triangle exactly once as (x, y, z), emitted from its lowest-
    * ordered vertex: wedge (x→y, x→z with ord(y) < ord(z)) closed by the
    * oriented edge y→z.
    *
    * The oriented frame is Materialize'd: it feeds BOTH wedge sides and
    * the closing join (3 references), and its construction (degree agg
    * + two joins over the caller's edge lineage) would otherwise be
    * re-executed per reference — on a derived edge frame (e.g. the
    * co-occurrence build) that re-execution multiplies the whole
    * upstream pipeline, the Spark-side analog of the re-inlined-CTE
    * blowup the r12 q_kcore oracle hit in DuckDB.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val o = Materialize(orientedEdges(edges))
    val wedges = o.as("e1").join(o.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dord") < col("e2.dord"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
    wedges.join(o.as("e3"),
        col("y") === col("e3.src") && col("z") === col("e3.dst"))
      .select("x", "y", "z")
  }

  /** Per-node triangle support: (node, n_triangles), every node in the
    * edge set present (0 if triangle-free).
    */
  def triangleSupport(edges: DataFrame): DataFrame = {
    val support = triangles(edges)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    degrees(edges).select(col("node")).join(support, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** One k-core peeling round: drop nodes with degree < k (and their
    * edges). Full decomposition iterates to a fixed point; callers doing
    * a bounded number of rounds get the standard "3-round approximate
    * core" (each round is one degree agg + one semi-join-style filter).
    */
  def peel(edges: DataFrame, k: Int): DataFrame = {
    // Materialize the round's input: it feeds the degree agg AND both
    // semi-joins (3 references), and peel rounds NEST — without the
    // checkpoint each round re-executes the previous rounds' whole
    // lineage per reference (~3^rounds upstream replays; the r12 sf0.1
    // board measured q_kcore at 45 s where the sibling one-pass
    // label-prop build took 2.5 s). Each checkpoint is edge-frame-sized
    // and freed by the ContextCleaner when the plan drops it.
    val e = Materialize(edges)
    val keep = degrees(e).filter(col("deg") >= k).select(col("node"))
    e
      .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
      .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
      .select("u", "v")
  }

  /** Synchronous min-label propagation over an undirected edge frame
    * (u, v), `rounds` rounds: every node starts labeled with itself and
    * each round takes the minimum of its own label and its neighbors'.
    * After r rounds a node carries the smallest node id within graph
    * distance r — the bounded-round community assignment (full
    * connected components is this run to a fixed point; see
    * DedupResolve.connectedComponents for the contraction version that
    * converges in O(log² n)). Bounded unrolling keeps the oracle
    * replayable and the shuffle count fixed: each round is one shuffle
    * join + one aggregation on the label frame, never on the corpus.
    */
  def labelPropagate(edges: DataFrame, rounds: Int): DataFrame = {
    // Materialize the symmetric edge frame (re-joined every round — one
    // checkpoint vs `rounds` replays of the caller's edge build) and
    // each round's label frame (referenced by the next round's join AND
    // its own left join; unmaterialized, the final plan re-executes
    // round r-1's lineage per reference — the iterative-loop
    // checkpoint cadence DedupResolve's contraction already uses).
    val sym = Materialize(edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v"))))
    val nodes = sym.select(col("u").as("node")).distinct()
    var lab = Materialize(nodes.withColumn("label", col("node")))
    for (_ <- 1 to rounds) {
      val nb = sym.join(lab.select(col("node").as("v"), col("label")), Seq("v"))
        .groupBy(col("u").as("node")).agg(min(col("label")).as("nl"))
      lab = Materialize(lab.join(nb, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label")))
    }
    lab
  }
}
