package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Final coverage block: remaining TPC-H shapes expressible on this schema
  * (Q15 top-by-aggregate, Q19 disjunctive predicate bands, Q22 anti-join
  * with scalar-average filter) plus event-funnel and cohort-retention —
  * the analytics every event pipeline feeds.
  */
object AnalyticsQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(10,2)")

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Q15 shape: entity with the maximum aggregate (top revenue supplier).
    Q("q15_top_supplier",
      (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("total_revenue"))
        val top = rev.agg(max(col("total_revenue")).as("mx"))
        rev.join(broadcast(top), col("total_revenue") === col("mx"))
          .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey
      """)),

    // ------------------------------------------------------------------
    // Q19 shape: disjunctive multi-band predicate over a dim join.
    Q("q19_disjunctive",
      (s, dir) => Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(11, 30) &&
            col("l_quantity").between(10, 40)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 50)))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"), count(lit(1)).as("n")),
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 30 AND l_quantity BETWEEN 10 AND 40)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
      """)),

    // ------------------------------------------------------------------
    // Q22 shape: above-average balances with no orders (anti-join +
    // scalar-average filter).
    Q("q22_cold_customers",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val avgBal = c.filter(col("c_acctbal") > 0)
          .agg(avg(col("c_acctbal")).as("ab"))
        // "no RECENT orders" — an unqualified anti-join is empty at the
        // test SFs (every customer has some order).
        val noOrders = c.join(
          Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        noOrders.join(broadcast(avgBal), col("c_acctbal") > col("ab"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_custs"), Q.dsum(col("c_acctbal")).as("total_bal"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_custs,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
      """)),

    // ------------------------------------------------------------------
    // CUBE: all grouping combinations in one pass.
    Q("q_cube",
      (s, dir) => Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)),

    // ------------------------------------------------------------------
    // Relative-standing windows: percent_rank and cume_dist of supplier
    // balances within each nation — the distribution-position primitives
    // (both are exact integer ratios, so the doubles are bit-portable).
    Q("q_percent_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("s_acctbal"), col("s_suppkey"))
        Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy(col("s_suppkey"))
      },
      Some("""
        SELECT s_suppkey, s_nationkey,
               percent_rank() OVER (PARTITION BY s_nationkey
                                    ORDER BY s_acctbal, s_suppkey) AS pr,
               cume_dist() OVER (PARTITION BY s_nationkey
                                 ORDER BY s_acctbal, s_suppkey) AS cd
        FROM supplier ORDER BY s_suppkey
      """)),

    // ------------------------------------------------------------------
    // Window FRAME value functions: first/last/nth over an explicit ROWS
    // frame, plus IGNORE NULLS lag — pure value passthrough (no float
    // arithmetic), so both engines must agree bit-for-bit.
    Q("q_frame_values",
      (s, dir) => Tables.events(s, dir).selectExpr(
        "event_id",
        "first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS fv",
        "last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS lv",
        "nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS nv",
        "lag(nullif(value, 0)) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_nn")
        .orderBy(col("event_id")),
      Some("""
        SELECT event_id,
               first_value(value) OVER w AS fv,
               last_value(value) OVER w AS lv,
               nth_value(value, 2) OVER w AS nv,
               lag(nullif(value, 0) IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_nn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
      """)),

    // ------------------------------------------------------------------
    // Running totals: cumulative spend per user over event time.
    Q("q_running_total",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("running_spend",
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
          .select(col("event_id"), col("user_id"), col("running_spend"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
        FROM events WHERE event_type = 'purchase'
        ORDER BY event_id
      """)),

    // ------------------------------------------------------------------
    // Inter-event deltas: seconds since the user's previous event.
    Q("q_event_deltas",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
          .select(col("event_id"), col("user_id"),
            ((unix_millis(col("ts")) - col("prev_ms")) / 1000).cast("long")
              .as("secs_since_prev"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id,
               CAST((epoch_ms(ts) - LAG(epoch_ms(ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000 AS BIGINT)
                 AS secs_since_prev
        FROM events ORDER BY event_id
      """)),

    // ------------------------------------------------------------------
    // Conversion funnel with PROGRESSIVE stage times: first click AFTER
    // the signup, first purchase AFTER that click — a user whose earliest
    // click predates signup still converts via a later click (global
    // first-event formulations undercount exactly those users).
    Q("q_funnel",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val su = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
        val cl = e.join(su, "user_id")
          .groupBy(col("user_id"), col("t_signup"))
          .agg(min(when(col("event_type") === "click" && col("ts") > col("t_signup"),
            col("ts"))).as("t_click_after"))
        val pu = e.join(cl, "user_id")
          .groupBy(col("user_id"), col("t_click_after"))
          .agg(min(when(col("event_type") === "purchase" &&
            col("ts") > col("t_click_after"), col("ts"))).as("t_purchase_after"))
        val totals = e.agg(countDistinct(col("user_id")).as("users"))
        totals.crossJoin(pu.agg(
          count(lit(1)).as("signed_up"),
          count(col("t_click_after")).as("clicked_after_signup"),
          count(col("t_purchase_after")).as("purchased_after_click")))
      },
      Some("""
        WITH su AS (
          SELECT user_id, MIN(ts) AS t_signup FROM events
          WHERE event_type = 'signup' GROUP BY user_id),
        cl AS (
          SELECT e.user_id,
                 MIN(CASE WHEN e.event_type = 'click' AND e.ts > su.t_signup
                     THEN e.ts END) AS t_click_after
          FROM events e JOIN su ON e.user_id = su.user_id
          GROUP BY e.user_id, su.t_signup),
        pu AS (
          SELECT e.user_id,
                 MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > cl.t_click_after
                     THEN e.ts END) AS t_purchase_after,
                 ANY_VALUE(cl.t_click_after) AS t_click_after
          FROM events e JOIN cl ON e.user_id = cl.user_id
          GROUP BY e.user_id, cl.t_click_after)
        SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS users,
               COUNT(*) AS signed_up,
               COUNT(t_click_after) AS clicked_after_signup,
               COUNT(t_purchase_after) AS purchased_after_click
        FROM pu
      """)),

    // ------------------------------------------------------------------
    // Cohort retention: users by first-seen day × days-since-cohort
    // activity counts (the standard retention triangle).
    Q("q_cohort",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id"))
        e.withColumn("cohort_day", date_trunc("day", min(col("ts")).over(w)))
          .withColumn("day_n",
            datediff(date_trunc("day", col("ts")), col("cohort_day")).cast("int"))
          .groupBy(col("cohort_day"), col("day_n"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .filter(col("day_n") <= 7)
          .orderBy(col("cohort_day"), col("day_n"))
      },
      Some("""
        WITH firstseen AS (
          SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day FROM events GROUP BY user_id)
        SELECT cohort_day, CAST(date_diff('day', cohort_day, date_trunc('day', ts)) AS INT) AS day_n,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM events e JOIN firstseen f ON e.user_id = f.user_id
        GROUP BY 1, 2
        HAVING day_n <= 7
        ORDER BY cohort_day, day_n
      """)),

    // ------------------------------------------------------------------
    // GROUPING SETS through the SQL surface (the general form rollup and
    // cube specialize; grouping_id disambiguates NULL-as-total rows).
    Q("q_grouping_sets",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("g_lineitem")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 COUNT(*) AS n,
                 CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid
          FROM g_lineitem
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """)
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
      """)),

    // ------------------------------------------------------------------
    // Multi-query shared scan (`SharedAgg`): three independent filtered
    // group-by reports over lineitem planned as ONE scan + ONE shuffle
    // (grouping sets + conditional aggregation) — the N-reports-one-pass
    // pattern a 100 TB nightly metrics sweep needs. The published frame is
    // the tagged union of the three standalone results; the oracle runs
    // them as three separate GROUP BYs (semantic equivalence is the whole
    // claim). Plan shape (1 scan, 1 exchange) is asserted in SharedAggSpec.
    Q("q_shared_metrics",
      (s, dir) => {
        import graft.operators.SharedAgg
        import graft.operators.SharedAgg.{Metric, Spec}
        val d18 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
        val specs = Seq(
          Spec("by_flag", Seq("l_returnflag"),
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp"),
            Seq(Metric("m_sum", "sum", d18(col("l_quantity"))),
                Metric("m_n", "count", lit(1)))),
          Spec("by_status", Seq("l_linestatus"), lit(true),
            Seq(Metric("m_sum", "sum",
              d18(col("l_extendedprice")) * (lit(1) - d18(col("l_discount")))),
                Metric("m_n", "count", lit(1)))),
          Spec("global", Seq.empty, col("l_discount") > 0.05,
            Seq(Metric("m_sum", "sum", d18(col("l_extendedprice"))),
                Metric("m_n", "count", lit(1)))))
        val shared = SharedAgg.run(Tables.lineitem(s, dir), specs)
        // Carve ALL three reports in ONE pass over the summary: an
        // exploded array of per-spec structs keeps a single plan subtree.
        // A union of three `split` branches instead gets its metric
        // columns pruned differently per branch, the aggregate subtrees
        // stop being identical, ReuseExchange can't fire, and the fact is
        // scanned three times (observed; an eager localCheckpoint of the
        // summary and a round-robin input fan-out both measured SLOWER
        // at this scale — recorded negative results; the win over
        // fact-side grouping sets came from SharedAgg's two-level
        // formulation instead, 3.6 → 1.8 s).
        val rows = specs.map { sp =>
          struct(
            lit(sp.name).as("qname"),
            (if (sp.groupBy.isEmpty) lit("")
             else col(sp.groupBy.head)).as("grp"),
            col(s"${sp.name}__m_sum").cast("double").as("m_sum"),
            col(s"${sp.name}__m_n").as("m_n"),
            (col("_gid") === lit(SharedAgg.gid(specs, sp)) &&
              col(s"_guard_${sp.name}") > 0).as("keep"))
        }
        val carved = shared.select(explode(array(rows: _*)).as("e"))
          .filter(col("e.keep"))
          .select(col("e.qname").as("qname"), col("e.grp").as("grp"),
            col("e.m_sum").as("m_sum"), col("e.m_n").as("m_n"))
        carved.orderBy(col("qname"), col("grp"))

      },
      Some("""
        SELECT * FROM (
          SELECT 'by_flag' AS qname, l_returnflag AS grp,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m_sum,
                 COUNT(*) AS m_n
          FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          GROUP BY 2
          UNION ALL
          SELECT 'by_status', l_linestatus,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
                 COUNT(*)
          FROM lineitem GROUP BY 2
          UNION ALL
          SELECT 'global', '',
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
                 COUNT(*)
          FROM lineitem WHERE l_discount > 0.05
        ) ORDER BY qname, grp
      """)),

    // ------------------------------------------------------------------
    // RANGE-frame window: trailing 1-hour moving average per user, framed
    // by event-TIME distance (not row count) on the microsecond epoch.
    // Decimal-exact numerator → the double division is order-independent.
    Q("q_moving_avg",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, 0L)
        Tables.events(s, dir)
          .withColumn("mov_avg", round(
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double") /
              count(lit(1)).over(w), 6))
          .select(col("event_id"), col("mov_avg"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id,
               round(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                     / (COUNT(*) OVER w), 6) AS mov_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
      """)),

    // ------------------------------------------------------------------
    // EXACT ntile deciles over a global order — WITHOUT the global-order
    // window (which funnels the frame through one task). Distributed
    // shape: range shuffle → parallel per-partition ranks → bounded
    // per-partition offsets (ScaleWindows.withGlobalRank), then NTILE
    // bucket arithmetic from the global rank. Same answer as NTILE(10)
    // OVER (ORDER BY ...) — the oracle still says exactly that.
    // q_ntile_approx below remains the sketch-based cheap path.
    Q("q_ntile",
      (s, dir) => {
        import graft.operators.ScaleWindows
        val cust = Tables.customer(s, dir)
        // Parquet-backed count folds to row-group stats — cheap.
        val total = cust.count()
        ScaleWindows.withGlobalRank(cust,
            Seq(col("c_acctbal"), col("c_custkey")), "rk")
          .withColumn("decile", ScaleWindows.ntileFromRank(col("rk"), total, 10))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"), Q.dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy(col("decile"))
      },
      Some("""
        SELECT decile, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM (SELECT c_acctbal,
                     NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
              FROM customer)
        GROUP BY decile ORDER BY decile
      """)),

    // ------------------------------------------------------------------
    // Scale-path deciles: q_ntile's answer WITHOUT the global sort. One
    // mergeable sketch agg yields the 9 boundary values (bounded: 9
    // doubles broadcast), then a fully parallel scan buckets every row
    // by boundary comparison. This is how the decile question survives
    // 100 TB; exact ntile above exists for its semantics. Rows-only
    // (sketch families differ across engines); error bound vs exact
    // asserted in DataPipelineSpec.
    Q("q_ntile_approx",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val bounds = cust.agg(percentile_approx(col("c_acctbal"),
          array((1 to 9).map(i => lit(i / 10.0)): _*), lit(10000)).as("bs"))
        cust.crossJoin(broadcast(bounds))
          .withColumn("decile",
            (size(filter(col("bs"), b => col("c_acctbal") > b)) + 1).cast("int"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"), Q.dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy(col("decile"))
      },
      None),

    // ------------------------------------------------------------------
    // Approximate aggregates — the sketches a 100 TB engine actually
    // runs: HLL++ distinct counts and t-digest-style percentiles. Not
    // cross-engine matchable (different sketch families) → rows-only;
    // the error bound vs exact is asserted in DataPipelineSpec.
    Q("q_approx_distinct",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_approx"))
        .orderBy(col("event_type")),
      None),

    // ------------------------------------------------------------------
    // Triangle counting on the supplier co-occurrence graph (suppliers
    // that ship in the same order are adjacent) — the clustering-
    // coefficient primitive for community/fraud analytics. Scale shape:
    //  - co-occurrence pairs ride a self-join on l_orderkey with a
    //    BOUNDED per-order fan-out (≤ 7 lineitems per TPC-H order →
    //    ≤ 21 pairs), so the explode is linear in input;
    //  - each edge is ORIENTED from the (degree, id)-smaller endpoint
    //    to the larger before the wedge join. Out-degrees are then
    //    bounded by O(sqrt(|E|)) on any graph (arboricity bound), so
    //    the wedge intermediate is O(|E|^1.5) worst-case instead of
    //    sum-of-squared-degrees — the difference between feasible and
    //    explosive on a power-law web graph;
    //  - each triangle is produced exactly once, from its lowest-
    //    ordered vertex; no distinct over the wedge output.
    Q("q_triangle_count",
      (s, dir) => {
        // NOT materialized (r12, measured): the four references to the
        // edge frame all end in identical exchanges that ReuseExchange
        // shares within the action; a checkpoint of a data-sized edge
        // frame costs more than it saves (sf10: 17 s vs 82+ s).
        val edges = graft.operators.Graphs.cooccurrenceEdges(
          Tables.lineitem(s, dir), "l_orderkey", "l_suppkey")
        graft.operators.Graphs.triangleSupport(edges)
          .select(col("node").as("suppkey"), col("n_triangles"))
          .orderBy(col("suppkey"))
      },
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                    FROM lineitem),
        edges AS (SELECT DISTINCT a.sk AS u, b.sk AS v
                  FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk),
        deg AS (SELECT node, COUNT(*) AS deg FROM (
                  SELECT u AS node FROM edges
                  UNION ALL SELECT v FROM edges) GROUP BY node),
        ordv AS (SELECT node, deg * 1048576 + node AS ord FROM deg),
        oriented AS (
          SELECT CASE WHEN ou.ord < ov.ord THEN e.u ELSE e.v END AS src,
                 CASE WHEN ou.ord < ov.ord THEN e.v ELSE e.u END AS dst,
                 greatest(ou.ord, ov.ord) AS dord
          FROM edges e
          JOIN ordv ou ON ou.node = e.u
          JOIN ordv ov ON ov.node = e.v),
        wedges AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
                   FROM oriented e1 JOIN oriented e2
                     ON e1.src = e2.src AND e1.dord < e2.dord),
        tris AS (SELECT x, y, z FROM wedges
                 JOIN oriented e3 ON e3.src = wedges.y AND e3.dst = wedges.z),
        support AS (SELECT node, COUNT(*) AS n_triangles FROM (
                      SELECT x AS node FROM tris
                      UNION ALL SELECT y FROM tris
                      UNION ALL SELECT z FROM tris) GROUP BY node)
        SELECT d.node AS suppkey, COALESCE(s.n_triangles, 0) AS n_triangles
        FROM deg d LEFT JOIN support s ON s.node = d.node
        ORDER BY suppkey
      """)),

    // ------------------------------------------------------------------
    // Local clustering coefficient — triangles normalized by the node's
    // wedge count 2T/(d(d-1)): the community-density metric on top of
    // q_triangle_count's support (Graphs.triangleSupport + degrees, same
    // oriented-wedge plan). Integer-scaled (floor ppm) so the division
    // is engine-exact; d < 2 publishes 0.
    Q("q_clustering_coeff",
      (s, dir) => {
        import graft.operators.Graphs
        val edges = Graphs.cooccurrenceEdges(
          Tables.lineitem(s, dir), "l_orderkey", "l_suppkey")
        Graphs.triangleSupport(edges)
          .join(Graphs.degrees(edges), Seq("node"))
          .select(col("node").as("suppkey"), col("deg"), col("n_triangles"),
            when(col("deg") >= 2,
              expr("2 * n_triangles * 1000000 DIV (deg * (deg - 1))"))
              .otherwise(lit(0L)).as("lcc_e6"))
          .orderBy(col("suppkey"))
      },
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                    FROM lineitem),
        edges AS (SELECT DISTINCT a.sk AS u, b.sk AS v
                  FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk),
        deg AS (SELECT node, COUNT(*) AS deg FROM (
                  SELECT u AS node FROM edges
                  UNION ALL SELECT v FROM edges) GROUP BY node),
        ordv AS (SELECT node, deg * 1048576 + node AS ord FROM deg),
        oriented AS (
          SELECT CASE WHEN ou.ord < ov.ord THEN e.u ELSE e.v END AS src,
                 CASE WHEN ou.ord < ov.ord THEN e.v ELSE e.u END AS dst,
                 greatest(ou.ord, ov.ord) AS dord
          FROM edges e
          JOIN ordv ou ON ou.node = e.u
          JOIN ordv ov ON ov.node = e.v),
        wedges AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
                   FROM oriented e1 JOIN oriented e2
                     ON e1.src = e2.src AND e1.dord < e2.dord),
        tris AS (SELECT x, y, z FROM wedges
                 JOIN oriented e3 ON e3.src = wedges.y AND e3.dst = wedges.z),
        support AS (SELECT node, COUNT(*) AS n_triangles FROM (
                      SELECT x AS node FROM tris
                      UNION ALL SELECT y FROM tris
                      UNION ALL SELECT z FROM tris) GROUP BY node)
        SELECT d.node AS suppkey, d.deg,
               COALESCE(s.n_triangles, 0) AS n_triangles,
               CASE WHEN d.deg >= 2
                    THEN 2 * COALESCE(s.n_triangles, 0) * 1000000
                         // (d.deg * (d.deg - 1))
                    ELSE 0 END AS lcc_e6
        FROM deg d LEFT JOIN support s ON s.node = d.node
        ORDER BY suppkey
      """)),

    // ------------------------------------------------------------------
    // 3-round k-core peeling on the WEIGHTED co-supply graph (edges =
    // supplier pairs whose shared-order count reaches the corpus's own
    // 80th weight percentile — the weight cut is what makes the graph
    // sparse enough for core structure to exist): each round drops
    // nodes with degree < k and their edges (one degree agg + two
    // semi-joins — Graphs.peel). Bounded unrolling, not a convergence
    // loop: the standard approximate core a 100 TB pipeline runs when
    // full peeling's O(peel-depth) rounds are too many; the oracle
    // replays all three rounds verbatim.
    //
    // SCALE-AWARE CUT (r12): the old fixed w ≥ 28 was calibrated on
    // sf0.01's dense 100-supplier pool; as the pool grows the shared-
    // order count per pair falls and the fixed cut empties the graph —
    // every sf0.1+ board was timing (and "oracle-matching") an EMPTY
    // answer. The cut is now percentile_disc(0.8) of the weight
    // distribution, computed from the weight HISTOGRAM (≤ max-weight
    // rows — never a corpus-sized percentile buffer) with integer-exact
    // cume arithmetic (cum·5 ≥ n·4 ⟺ cume_dist ≥ 0.8) so both engines
    // replay the cut bit-for-bit, the t_winsorize discipline.
    Q("q_kcore",
      (s, dir) => {
        import graft.operators.Graphs
        // pw is referenced by the weight histogram AND the cut filter,
        // but both references share the groupBy(u, v) exchange via
        // ReuseExchange — checkpointing the data-sized pair frame costs
        // a full extra write (measured r12, the triangles lesson).
        val pw = Graphs.cooccurrenceWeightedEdges(
          Tables.lineitem(s, dir), "l_orderkey", "l_suppkey")
        val hist = pw.groupBy(col("w")).agg(count(lit(1)).as("c"))
        val tot = hist.agg(sum(col("c")).as("n"))
        // Histogram-sized frames: the global-order window runs over
        // ≤ distinct-weight rows (hundreds), never the pair frame.
        val cum = hist.withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("w"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        val wcut = cum.crossJoin(broadcast(tot))
          .filter(col("cum") * 5 >= col("n") * 4)
          .agg(min(col("w")).as("wc"))
        val edges = pw.crossJoin(broadcast(wcut))
          .filter(col("w") >= col("wc")).select("u", "v")
        // Loop-owned rounds (dead rounds freed eagerly, default
        // storage level — MEMORY_AND_DISK_SER was A/B'd and rejected
        // on its sf100 regression) — the nested peel(peel(peel(...)))
        // plan left 3-4 round caches live across the whole query, the
        // memory surface behind the 36-165 s swing band (r13 verdict).
        val core = Graphs.kcore(edges, k = 10, rounds = 3)
        Graphs.degrees(core)
          .select(col("node").as("suppkey"), col("deg"))
          .orderBy(col("suppkey"))
      },
      Some("""
        WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
                    l_suppkey AS sk FROM lineitem),
        pw AS MATERIALIZED (SELECT a.sk AS u, b.sk AS v, COUNT(*) AS w
               FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
               GROUP BY 1, 2),
        hist AS (SELECT w, COUNT(*) AS c FROM pw GROUP BY 1),
        tot AS (SELECT SUM(c) AS n FROM hist),
        cum AS (SELECT w, SUM(c) OVER (ORDER BY w) AS cum FROM hist),
        wcut AS (SELECT MIN(w) AS wc FROM cum, tot WHERE cum * 5 >= n * 4),
        e0 AS MATERIALIZED (SELECT u, v FROM pw, wcut WHERE w >= wc),
        d0 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
                 SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
               GROUP BY node),
        e1 AS MATERIALIZED (SELECT u, v FROM e0
               WHERE u IN (SELECT node FROM d0 WHERE deg >= 10)
                 AND v IN (SELECT node FROM d0 WHERE deg >= 10)),
        d1 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
                 SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)
               GROUP BY node),
        e2 AS MATERIALIZED (SELECT u, v FROM e1
               WHERE u IN (SELECT node FROM d1 WHERE deg >= 10)
                 AND v IN (SELECT node FROM d1 WHERE deg >= 10)),
        d2 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
                 SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2)
               GROUP BY node),
        e3 AS (SELECT u, v FROM e2
               WHERE u IN (SELECT node FROM d2 WHERE deg >= 10)
                 AND v IN (SELECT node FROM d2 WHERE deg >= 10)),
        d3 AS (SELECT node, COUNT(*) AS deg FROM (
                 SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
               GROUP BY node)
        SELECT node AS suppkey, deg FROM d3 ORDER BY suppkey
      """)),

    // ------------------------------------------------------------------
    // 3-round min-label propagation on the weighted co-supply graph (the
    // q_kcore edge cut): every supplier starts labeled with itself and
    // each synchronous round adopts the minimum label in its closed
    // neighborhood — after r rounds a node carries the smallest supplier
    // id within distance r, the bounded-round community assignment.
    // Scale shape: the per-round cost is one shuffle join of the edge
    // frame against the (node, label) frame plus a min-agg — label
    // frames only, the corpus is never re-shuffled — and bounded
    // unrolling (vs a convergence loop) fixes the stage count and keeps
    // the oracle a finite SQL replay, like q_kcore/q_pagerank.
    Q("q_label_prop",
      (s, dir) => {
        import graft.operators.Graphs
        // Same scale-aware 80th-percentile weight cut as q_kcore (the
        // shared "co-supply community graph" definition) — the fixed
        // w ≥ 28 cut emptied the graph above sf0.01, making the
        // propagation vacuous exactly where the boards time it.
        // pw is referenced by the weight histogram AND the cut filter,
        // but both references share the groupBy(u, v) exchange via
        // ReuseExchange — checkpointing the data-sized pair frame costs
        // a full extra write (measured r12, the triangles lesson).
        val pw = Graphs.cooccurrenceWeightedEdges(
          Tables.lineitem(s, dir), "l_orderkey", "l_suppkey")
        val hist = pw.groupBy(col("w")).agg(count(lit(1)).as("c"))
        val tot = hist.agg(sum(col("c")).as("n"))
        val cum = hist.withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("w"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        val wcut = cum.crossJoin(broadcast(tot))
          .filter(col("cum") * 5 >= col("n") * 4)
          .agg(min(col("w")).as("wc"))
        val edges = pw.crossJoin(broadcast(wcut))
          .filter(col("w") >= col("wc")).select("u", "v")
        Graphs.labelPropagate(edges, 3)
          .select(col("node").as("suppkey"), col("label").as("community"))
          .orderBy(col("suppkey"))
      },
      Some("""
        WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
                    l_suppkey AS sk FROM lineitem),
        pw AS MATERIALIZED (SELECT a.sk AS u, b.sk AS v, COUNT(*) AS w
               FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
               GROUP BY 1, 2),
        hist AS (SELECT w, COUNT(*) AS c FROM pw GROUP BY 1),
        tot AS (SELECT SUM(c) AS n FROM hist),
        cum AS (SELECT w, SUM(c) OVER (ORDER BY w) AS cum FROM hist),
        wcut AS (SELECT MIN(w) AS wc FROM cum, tot WHERE cum * 5 >= n * 4),
        e0 AS MATERIALIZED (SELECT u, v FROM pw, wcut WHERE w >= wc),
        sym AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
        n AS (SELECT DISTINCT u AS node FROM sym),
        l0 AS MATERIALIZED (SELECT node, node AS label FROM n),
        r1 AS (SELECT s.u AS node, MIN(l.label) AS nl
               FROM sym s JOIN l0 l ON l.node = s.v GROUP BY 1),
        l1 AS MATERIALIZED (SELECT l0.node,
                      least(l0.label, coalesce(r1.nl, l0.label)) AS label
               FROM l0 LEFT JOIN r1 ON r1.node = l0.node),
        r2 AS (SELECT s.u AS node, MIN(l.label) AS nl
               FROM sym s JOIN l1 l ON l.node = s.v GROUP BY 1),
        l2 AS MATERIALIZED (SELECT l1.node,
                      least(l1.label, coalesce(r2.nl, l1.label)) AS label
               FROM l1 LEFT JOIN r2 ON r2.node = l1.node),
        r3 AS (SELECT s.u AS node, MIN(l.label) AS nl
               FROM sym s JOIN l2 l ON l.node = s.v GROUP BY 1),
        l3 AS (SELECT l2.node,
                      least(l2.label, coalesce(r3.nl, l2.label)) AS label
               FROM l2 LEFT JOIN r3 ON r3.node = l2.node)
        SELECT node AS suppkey, label AS community FROM l3 ORDER BY suppkey
      """)),

    // ------------------------------------------------------------------
    // Key-skew report — the diagnostic an engineer runs BEFORE picking a
    // partitioning/salting strategy for a join or aggregation key: the
    // top-20 heaviest keys with their absolute and cumulative share of
    // all rows (integer-exact, parts-per-million). Scale shape: one
    // partial-agg count per key, a TakeOrdered top-20 (never a global
    // sort), the two-row total broadcast by a crossJoin, and the
    // running-sum window over exactly 20 rows. The decision rule it
    // feeds: a top-key share over ~1/shuffle.partitions means the
    // largest reducer is key-bound → salt or let AQE split it.
    Q("x_skew_report",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables.events(s, dir)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        val tot = counts.agg(sum(col("n")).as("total"),
          count(lit(1)).as("n_keys"))
        val top = counts.orderBy(col("n").desc, col("user_id")).limit(20)
        val w = Window.orderBy(col("n").desc, col("user_id"))
        top.crossJoin(broadcast(tot))
          .withColumn("rk", row_number().over(w))
          .withColumn("cum_n", sum(col("n")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("rk").cast("long").as("rk"), col("user_id"),
            col("n"), col("n_keys"),
            expr("n * 1000000 DIV total").as("share_e6"),
            expr("cum_n * 1000000 DIV total").as("cum_share_e6"))
          .orderBy(col("rk"))
      },
      Some("""
        WITH counts AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
        -- CAST: DuckDB SUM(n) is HUGEINT; uncast, the // results publish
        -- as HUGEINT -> float64 in the driver and the hash mismatches.
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys
                FROM counts),
        top AS (SELECT user_id, n FROM counts ORDER BY n DESC, user_id LIMIT 20),
        ranked AS (SELECT user_id, n,
                          ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk,
                          CAST(SUM(n) OVER (ORDER BY n DESC, user_id
                                            ROWS UNBOUNDED PRECEDING)
                               AS BIGINT) AS cum_n
                   FROM top)
        SELECT rk, user_id, n, n_keys,
               CAST(n * 1000000 // total AS BIGINT) AS share_e6,
               CAST(cum_n * 1000000 // total AS BIGINT) AS cum_share_e6
        FROM ranked, tot ORDER BY rk
      """)),

    // ------------------------------------------------------------------
    // First-order event-transition matrix: per user, each event followed
    // by the user's next event (ts, then event_id as the deterministic
    // tiebreak) — the Markov-chain base behind next-action prediction
    // and funnel-drop analysis. ONE shuffle on user_id feeds the lag
    // window; the (src,dst) count agg is partial-agg'd map-side down to
    // ≤ |types|² rows, and the per-src share is floor-ppm integer
    // division (engine-exact, the q_clustering_coeff discipline).
    Q("q_event_transitions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = Tables.events(s, dir)
          .withColumn("dst", lead(col("event_type"), 1).over(w))
          .filter(col("dst").isNotNull)
          .groupBy(col("event_type").as("src"), col("dst"))
          .agg(count(lit(1)).as("n"))
        val wSrc = Window.partitionBy(col("src"))
        pairs
          .withColumn("tot", sum(col("n")).over(wSrc))
          .select(col("src"), col("dst"), col("n"),
            expr("n * 1000000 DIV tot").as("share_ppm"))
          .orderBy(col("src"), col("dst"))
      },
      Some("""
        WITH seq AS (SELECT user_id, event_type AS src,
                            LEAD(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS dst
                     FROM events),
        c AS (SELECT src, dst, COUNT(*) AS n FROM seq
              WHERE dst IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT src, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        SELECT c.src, c.dst, c.n,
               CAST(c.n * 1000000 // t.tot AS BIGINT) AS share_ppm
        FROM c JOIN t USING (src) ORDER BY src, dst
      """)),

    // ------------------------------------------------------------------
    // Inter-event gap distribution per user: count, discrete median and
    // p90 of consecutive-event gaps in ms — the engagement-cadence
    // profile behind churn/anomaly features. Gaps come from ONE lag
    // window on the user_id shuffle; the percentiles are DISCRETE
    // (min value whose cume_dist ≥ q — actual data values, the
    // t_winsorize cross-engine discipline, no interpolation drift).
    Q("q_user_gaps",
      (s, dir) => {
        val wSeq = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .withColumn("gap",
            unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(wSeq)))
          .filter(col("gap").isNotNull)
        val wCd = Window.partitionBy(col("user_id")).orderBy(col("gap"))
        gaps.withColumn("cd", cume_dist().over(wCd))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_gaps"),
            min(when(col("cd") >= 0.5, col("gap"))).as("median_gap_ms"),
            min(when(col("cd") >= 0.9, col("gap"))).as("p90_gap_ms"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH g AS (SELECT user_id,
                          epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id) AS gap
                   FROM events),
        g2 AS (SELECT user_id, gap,
                      cume_dist() OVER (PARTITION BY user_id ORDER BY gap) AS cd
               FROM g WHERE gap IS NOT NULL)
        SELECT user_id, COUNT(*) AS n_gaps,
               CAST(MIN(CASE WHEN cd >= 0.5 THEN gap END) AS BIGINT)
                 AS median_gap_ms,
               CAST(MIN(CASE WHEN cd >= 0.9 THEN gap END) AS BIGINT)
                 AS p90_gap_ms
        FROM g2 GROUP BY 1 ORDER BY user_id
      """)),

    // ------------------------------------------------------------------
    // Sequential pattern mining, order 3: each user's consecutive
    // event-type trigrams (ts, then event_id as the deterministic
    // tiebreak), counted corpus-wide — the path-mining step above
    // q_event_transitions' bigram matrix ("what do users do next, two
    // steps out"). ONE shuffle on user_id feeds BOTH lead windows (same
    // partitioning and sort, one Window operator); the count agg is
    // partial-agg'd map-side down to ≤ |types|³ rows, so the top-20 is
    // a TakeOrdered merge, never a global sort of event-cardinality.
    Q("q_path_trigrams",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("s2", lead(col("event_type"), 1).over(w))
          .withColumn("s3", lead(col("event_type"), 2).over(w))
          .filter(col("s3").isNotNull)
          .groupBy(col("event_type").as("s1"), col("s2"), col("s3"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
          .limit(20)
      },
      Some("""
        WITH seq AS (SELECT event_type AS s1,
                            LEAD(event_type, 1) OVER w AS s2,
                            LEAD(event_type, 2) OVER w AS s3
                     FROM events
                     WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT s1, s2, s3, COUNT(*) AS n
        FROM seq WHERE s3 IS NOT NULL
        GROUP BY 1, 2, 3 ORDER BY n DESC, s1, s2, s3 LIMIT 20
      """)),

    // ------------------------------------------------------------------
    // Market-basket affinity over co-ordered part brands: support counts
    // and integer-ppm lift (n_xy·N·1e6)/(n_x·n_y) for every brand pair
    // sharing an order — the association-rule base behind cross-sell and
    // assortment analyses. The pair build is the audited co-occurrence
    // plan (distinct (order, brand) + self-join on the order key):
    // output is bounded by |brands|², per-order fan-out by the basket's
    // DISTINCT-BRAND count (≤ 25) — the bound that held q_triangle_count
    // linear at factor 1000. Marginals are |brands| rows and broadcast;
    // lift arithmetic is decimal so n_xy·N·1e6 cannot overflow long at
    // corpus scale. Lift > 1e6 means the pair co-occurs MORE than
    // independence predicts.
    Q("q_basket_affinity",
      (s, dir) => {
        // r13 (verdict item 4): single-consumer pipeline replacing the
        // 4×-re-scanned ob plan. ONE groupBy(okey) builds the bounded
        // per-order distinct-brand set (≤ |brands| = 25 elements,
        // collect_set partial-aggregates map-side), ONE explode emits
        // per basket its brand pairs + singles + an order marker
        // (fan-out ≤ C(25,2)+25+1 — the q_triangle_count bound), and
        // ONE count agg collapses that to ≤ |brands|²+|brands|+1 rows
        // carrying pairs (x,y), marginals (x,null) and the order total
        // (null,null) TOGETHER — so the fact join runs once and only
        // this brands²-bounded frame is materialized (the
        // bounded-frame-only checkpoint rule from the r12 A/B: the
        // fact-cardinality ob checkpoint crashed the JVM at factor
        // 1000). Map-side combine makes the explode's shuffle
        // ≤ brands²/partition regardless of row count.
        // NOT broadcast (A/B at both factors, r13): forcing the
        // two-column part projection broadcast won sf10 runs (22.8 vs
        // 37.9 s, within the swing band) but LOST at factor 1000
        // (233-299 s vs 211 s plain) — part is sf-PROPORTIONAL in this
        // schema, so its hash relation grows with the fact side and the
        // broadcast does not survive a 100× scale-up. The plain join
        // leaves the choice to AQE, which broadcasts exactly when the
        // dim side is genuinely small at runtime.
        val stats = graft.operators.Materialize(
          Tables.lineitem(s, dir)
            .join(Tables.part(s, dir)
              .select(col("p_partkey"), col("p_brand")),
              col("l_partkey") === col("p_partkey"))
            .groupBy(col("l_orderkey"))
            .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
            .select(explode(expr(
              """concat(
                   flatten(transform(bs, (x, i) ->
                     transform(slice(bs, i + 2, size(bs)), y ->
                       named_struct('x', x, 'y', y)))),
                   transform(bs, x ->
                     named_struct('x', x, 'y', CAST(NULL AS STRING))),
                   array(named_struct('x', CAST(NULL AS STRING),
                                      'y', CAST(NULL AS STRING))))"""))
              .as("pk"))
            .groupBy(col("pk.x").as("bx"), col("pk.y").as("by"))
            .agg(count(lit(1)).as("n")))
        val marg = stats.filter(col("bx").isNotNull && col("by").isNull)
          .select(col("bx").as("brand"), col("n").as("n_b"))
        val tot = stats.filter(col("bx").isNull)
          .select(col("n").as("n_orders"))
        stats.filter(col("by").isNotNull)
          .select(col("bx").as("brand_x"), col("by").as("brand_y"),
            col("n").as("n_xy"))
          .join(broadcast(marg.toDF("brand_x", "n_x")), Seq("brand_x"))
          .join(broadcast(marg.toDF("brand_y", "n_y")), Seq("brand_y"))
          .crossJoin(broadcast(tot))
          .select(col("brand_x"), col("brand_y"), col("n_xy"),
            col("n_x"), col("n_y"),
            expr("""CAST((CAST(n_xy AS DECIMAL(38,0)) * n_orders * 1000000)
                    DIV (CAST(n_x AS DECIMAL(38,0)) * n_y) AS BIGINT)""")
              .as("lift_ppm"))
          .orderBy(col("brand_x"), col("brand_y"))
      },
      Some("""
        WITH ob AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
                    FROM lineitem JOIN part ON l_partkey = p_partkey),
        m AS (SELECT brand, COUNT(*) AS n_b FROM ob GROUP BY 1),
        t AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM ob),
        p AS (SELECT a.brand AS brand_x, b.brand AS brand_y,
                     COUNT(*) AS n_xy
              FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
              GROUP BY 1, 2)
        SELECT brand_x, brand_y, n_xy, mx.n_b AS n_x, my.n_b AS n_y,
               CAST(CAST(n_xy AS HUGEINT) * n_orders * 1000000
                    // (CAST(mx.n_b AS HUGEINT) * my.n_b) AS BIGINT)
                 AS lift_ppm
        FROM p JOIN m mx ON p.brand_x = mx.brand
               JOIN m my ON p.brand_y = my.brand, t
        ORDER BY brand_x, brand_y
      """)),

    // ------------------------------------------------------------------
    // RFM customer segmentation: recency (days since the customer's last
    // order vs the corpus max date), frequency (order count), monetary
    // (decimal-exact spend) — each scored into quintiles by comparison
    // against percentile_disc(0.2/0.4/0.6/0.8) thresholds (the
    // t_winsorize discipline: DISCRETE data values, cross-engine exact —
    // never ntile over a global sort, which would put the whole customer
    // frame in one window task). One orders shuffle on custkey builds
    // the per-customer frame; thresholds are ONE tiny agg broadcast
    // back; segments aggregate to ≤ 5³ rows map-side. Recency scores
    // INVERT (5 = most recent); decimal spend compares exactly against
    // the decimal threshold.
    Q("q_rfm_segments",
      (s, dir) => {
        // NOT Materialize'd (A/B at both factors, r12 s4): rfm/r each
        // have two consumers, and checkpointing both won at sf10
        // (6.15 → 4.65 s) but LOST at factor 1000 (34.4 s plain vs
        // 40.5/74.0 s checkpointed across two isolated runs) — two
        // customer-cardinality block stores churn the heap harder than
        // re-running the orders shuffle. Same bounded-frame-only rule
        // as q_basket_affinity.
        val rfm = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(max(col("o_orderdate").cast("date")).as("last_d"),
            count(lit(1)).as("f"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("m"))
        val mx = rfm.agg(max(col("last_d")).as("max_d"))
        val r = rfm.crossJoin(broadcast(mx))
          .withColumn("r", datediff(col("max_d"), col("last_d")))
        val cuts = r.agg(
          expr("percentile_disc(0.2) WITHIN GROUP (ORDER BY r)").as("r1"),
          expr("percentile_disc(0.4) WITHIN GROUP (ORDER BY r)").as("r2"),
          expr("percentile_disc(0.6) WITHIN GROUP (ORDER BY r)").as("r3"),
          expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY r)").as("r4"),
          expr("percentile_disc(0.2) WITHIN GROUP (ORDER BY f)").as("f1"),
          expr("percentile_disc(0.4) WITHIN GROUP (ORDER BY f)").as("f2"),
          expr("percentile_disc(0.6) WITHIN GROUP (ORDER BY f)").as("f3"),
          expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY f)").as("f4"),
          expr("percentile_disc(0.2) WITHIN GROUP (ORDER BY m)").as("m1"),
          expr("percentile_disc(0.4) WITHIN GROUP (ORDER BY m)").as("m2"),
          expr("percentile_disc(0.6) WITHIN GROUP (ORDER BY m)").as("m3"),
          expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY m)").as("m4"))
        r.crossJoin(broadcast(cuts))
          .select(
            (lit(5L) - (col("r") > col("r1")).cast("long")
              - (col("r") > col("r2")).cast("long")
              - (col("r") > col("r3")).cast("long")
              - (col("r") > col("r4")).cast("long")).as("r_score"),
            (lit(1L) + (col("f") > col("f1")).cast("long")
              + (col("f") > col("f2")).cast("long")
              + (col("f") > col("f3")).cast("long")
              + (col("f") > col("f4")).cast("long")).as("f_score"),
            (lit(1L) + (col("m") > col("m1")).cast("long")
              + (col("m") > col("m2")).cast("long")
              + (col("m") > col("m3")).cast("long")
              + (col("m") > col("m4")).cast("long")).as("m_score"),
            col("m"))
          .groupBy(col("r_score"), col("f_score"), col("m_score"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("m")).cast("double").as("sum_monetary"))
          .orderBy(col("r_score"), col("f_score"), col("m_score"))
      },
      Some("""
        WITH rfm AS (SELECT o_custkey,
                            MAX(CAST(o_orderdate AS DATE)) AS last_d,
                            COUNT(*) AS f,
                            SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
                     FROM orders GROUP BY 1),
        r AS (SELECT o_custkey, f, m,
                     date_diff('day', last_d, (SELECT MAX(last_d) FROM rfm))
                       AS r
              FROM rfm),
        cuts AS (SELECT
            quantile_disc(r, 0.2) AS r1, quantile_disc(r, 0.4) AS r2,
            quantile_disc(r, 0.6) AS r3, quantile_disc(r, 0.8) AS r4,
            quantile_disc(f, 0.2) AS f1, quantile_disc(f, 0.4) AS f2,
            quantile_disc(f, 0.6) AS f3, quantile_disc(f, 0.8) AS f4,
            quantile_disc(m, 0.2) AS m1, quantile_disc(m, 0.4) AS m2,
            quantile_disc(m, 0.6) AS m3, quantile_disc(m, 0.8) AS m4
          FROM r),
        scored AS (SELECT
            5 - (r > r1)::INT - (r > r2)::INT - (r > r3)::INT
              - (r > r4)::INT AS r_score,
            1 + (f > f1)::INT + (f > f2)::INT + (f > f3)::INT
              + (f > f4)::INT AS f_score,
            1 + (m > m1)::INT + (m > m2)::INT + (m > m3)::INT
              + (m > m4)::INT AS m_score,
            m
          FROM r, cuts)
        SELECT CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               COUNT(*) AS n_customers,
               CAST(SUM(m) AS DOUBLE) AS sum_monetary
        FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
      """)),

    // ------------------------------------------------------------------
    // Order-to-ship latency distribution per priority: count, min,
    // discrete median/p90, max of (shipdate − orderdate) days — the SLA
    // readout every fulfillment pipeline tracks. percentile_disc is an
    // AGGREGATE (the t_winsorize discipline), not a per-group ordered
    // window: a cume_dist window here would sort each of the 5 fat
    // priority partitions in one task, while the aggregate buffers a
    // value→count map whose size is the ~hundreds of DISTINCT day
    // values, exact and map-side-combinable at any row count. One join
    // shuffle + one bounded agg.
    Q("q_ship_latency",
      (s, dir) => {
        val lat = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority").as("priority"),
            datediff(col("l_shipdate").cast("date"),
              col("o_orderdate").cast("date")).cast("long").as("lat_days"))
        lat.groupBy(col("priority"))
          .agg(count(lit(1)).as("n_items"),
            min(col("lat_days")).as("min_days"),
            // Spark publishes percentile_disc as DOUBLE even over BIGINT
            // input; the discrete quantile of a BIGINT column IS a BIGINT,
            // so cast back to the input type (DuckDB's quantile_disc
            // agrees).
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_days)")
              .cast("long").as("median_days"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_days)")
              .cast("long").as("p90_days"),
            max(col("lat_days")).as("max_days"))
          .orderBy(col("priority"))
      },
      Some("""
        WITH lat AS (
          SELECT o_orderpriority AS priority,
                 CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                CAST(l_shipdate AS DATE)) AS BIGINT)
                   AS lat_days
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT priority, COUNT(*) AS n_items,
               MIN(lat_days) AS min_days,
               quantile_disc(lat_days, 0.5) AS median_days,
               quantile_disc(lat_days, 0.9) AS p90_days,
               MAX(lat_days) AS max_days
        FROM lat GROUP BY 1 ORDER BY priority
      """))
  )
}
