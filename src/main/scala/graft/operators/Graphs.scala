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
    * Plan: hash distinct + group-keyed self-join ([[groupPairs]] — see
    * its note for why the collect_set alternative measured 4.9× slower),
    * one final pair-dedup/weight shuffle. The r11 sf100 probes' 1.5-1.8×
    * residual on the graph queries turned out to be lineage RE-EXECUTION
    * (unmaterialized edge frames replayed per reference through the peel
    * rounds / orientation joins — fixed by the Materialize discipline in
    * [[peel]]/[[triangles]]/[[labelPropagate]] and the callers), not the
    * join shape itself.
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

  /** One (u, v) row per (group, unordered member pair): hash-distinct
    * the (group, member) rows, self-equi-join on the group, keep the
    * ordered half. Output is NOT pair-distinct across groups — callers
    * aggregate or distinct it.
    *
    * MEASURED plan note (r12): the tempting alternative — per-group
    * `collect_set` + in-row pair expansion, one shuffle fewer on paper —
    * ran 4.9× SLOWER at sf10 (82.7 s vs the 17.0 s floor for the whole
    * triangle query): collect_set plans as ObjectHashAggregate, which
    * falls back to SORT-based aggregation once its map passes the
    * spark.sql.objectHashAggregate.sortBased.fallbackThreshold keys
    * (default 128), so the "one groupBy" is really a full sort of the
    * member frame per partition. The codegen'd hash distinct + sort-
    * merge self-join is the shape that survives scale; raising the
    * fallback threshold globally would un-guard every posting-list
    * collect in the dedup family, so it stays default.
    */
  private def groupPairs(df: DataFrame, groupCol: String,
      memberCol: String): DataFrame = {
    // ONE exchange for distinct + self-join (r15, measured): hash-
    // repartition by g alone, then let both the (g, m) distinct and the
    // g-keyed self-join run on that partitioning — HashPartitioning(g)
    // satisfies ClusteredDistribution(g, m), and the join keys are
    // exactly g, so EnsureRequirements inserts no further exchange and
    // ReuseExchange shares the one shuffle between the join's two
    // sides. The previous shape (distinct first) shuffled the member
    // frame twice: once by (g, m) for the distinct, once by g for the
    // join. Cost shifted: the distinct's map-side partial agg no longer
    // runs below the shuffle — on (order, supplier)-like inputs with
    // few duplicate memberships that partial removed almost nothing, so
    // trading it for a whole exchange of the frame is the right side of
    // the ledger (interleaved sf10 A/B on q_kcore/q_label_prop/
    // q_triangle_count: see OPTIMIZATION_r15.md).
    val m = df.select(col(groupCol).as("g"), col(memberCol).as("m"))
      .repartition(col("g")).distinct()
    m.as("a").join(m.as("b"), Seq("g"))
      .filter(col("a.m") < col("b.m"))
      .select(col("a.m").as("u"), col("b.m").as("v"))
  }

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
    * Deliberately NOT Materialize'd (r12, measured): the oriented frame
    * is referenced three times, but every reference bottoms out in
    * IDENTICAL exchange subtrees that ReuseExchange dedups within the
    * one action — while a localCheckpoint of a data-sized edge frame
    * pays a full extra write per pass (sf10: 17 s floor unmaterialized
    * vs 82-138 s with edge/oriented checkpoints). Materialize earns its
    * keep only where reuse CANNOT fire — across peel rounds whose
    * subtrees differ (see [[peel]]) — never on a frame the optimizer
    * already shares.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val o = orientedEdges(edges)
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
    // lineage per reference, and (measured r12) ReuseExchange does NOT
    // dedup the nested round subtrees the way it shares triangles'
    // identical oriented-frame references: q_kcore A/B at sf10 ran
    // 293.5 s lineage-only vs 54.8 s with per-round checkpoints (76.3
    // vs 3.4 s at sf0.1). Round inputs are post-cut edge frames — small
    // relative to the pair build — and each checkpoint is freed by the
    // ContextCleaner when the plan drops it.
    val e = Materialize(edges)
    val keep = degrees(e).filter(col("deg") >= k).select(col("node"))
    e
      .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
      .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
      .select("u", "v")
  }

  /** `rounds` nested [[peel]] rounds with the iterative-loop block
    * discipline: the PREVIOUS round's blocks are freed as soon as the
    * next round has materialized, instead of lingering until the
    * ContextCleaner's next GC-driven sweep. Nested `peel(peel(...))`
    * keeps working (each call materializes its own input); this is the
    * loop owner that can also free the dead rounds.
    *
    * Storage level stays the DEFAULT deserialized MEMORY_AND_DISK —
    * measured both ways (r14): MEMORY_AND_DISK_SER did NOT tame the
    * isolated swing band (GC logging shows ≤ 4.6 s total JVM pause on
    * both fast and slow runs — the variance is I/O-side in the
    * pair-build shuffle, not heap churn) and regressed the sf100 probe
    * (q_label_prop 274.5 → 401.1 s: per-round encode/decode on
    * million-node frames is pure CPU cost once GC is not the
    * constraint). The eager free is kept — it is cost-free and bounds
    * live blocks to one round.
    */
  def kcore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = Materialize(edges)
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("node"))
      val next = Materialize(
        e.join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
          .select("u", "v"))
      freeBlocks(e)
      e = next
    }
    e
  }

  /** Free a localCheckpoint'd frame's blocks NOW (the checkpointed RDD
    * behind its LogicalRDD leaf), rather than waiting for a GC to reach
    * the ContextCleaner. Only safe for frames whose consumers have all
    * completed — the loop-owner case. No-op when the plan isn't a
    * checkpoint leaf.
    */
  private def freeBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
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
    // Eager free of the dead round (see [[kcore]] — default storage
    // level kept; SER was measured and rejected): a round's blocks
    // otherwise outlive their last read by a full GC cycle.
    val sym = Materialize(edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v"))))
    val nodes = sym.select(col("u").as("node")).distinct()
    var lab = Materialize(nodes.withColumn("label", col("node")))
    for (_ <- 1 to rounds) {
      val nb = sym.join(lab.select(col("node").as("v"), col("label")), Seq("v"))
        .groupBy(col("u").as("node")).agg(min(col("label")).as("nl"))
      val next = Materialize(lab.join(nb, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label")))
      freeBlocks(lab)
      lab = next
    }
    freeBlocks(sym)
    lab
  }
}
