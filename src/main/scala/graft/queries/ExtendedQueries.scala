package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.sources.Tables

/** Second wave of relational coverage: scan-heavy filter agg (Q6 shape),
  * pivot, exact percentiles, outer-join aggregation, JSON extraction, and
  * the bucketed range join (SURVEY.md §2.2/§2.1 extensions).
  */
object ExtendedQueries {

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // TPC-H Q6 shape: pure scan + filter + sum — pushdown showcase.
    Q("q6_forecast",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice").cast("decimal(10,2)") *
          col("l_discount").cast("decimal(10,2)"))).cast("double").as("revenue"),
          count(lit(1)).as("n")),
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(l_discount AS DECIMAL(10,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
      """)),

    // ------------------------------------------------------------------
    // FULL OUTER reconciliation: per-customer activity in two periods,
    // customers present in either side survive with zero-defaults — the
    // snapshot-diff shape (closes the outer-join coverage next to
    // q_outer_agg's left-outer).
    Q("q_full_outer",
      (s, dir) => {
        def side(y: String, alias: String) = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit(s"${y.toInt + 1}-01-01").cast("timestamp"))
          .groupBy(col("o_custkey").as(s"${alias}_key"))
          .agg(count(lit(1)).as(s"n_$alias"))
        side("1995", "a").join(side("1996", "b"),
            col("a_key") === col("b_key"), "full_outer")
          .select(
            coalesce(col("a_key"), col("b_key")).as("custkey"),
            coalesce(col("n_a"), lit(0L)).as("n_1995"),
            coalesce(col("n_b"), lit(0L)).as("n_1996"),
            (coalesce(col("n_b"), lit(0L)) - coalesce(col("n_a"), lit(0L)))
              .as("delta"))
          .orderBy(col("custkey"))
      },
      Some("""
        WITH a AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                     AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00' GROUP BY 1),
             b AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                     AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00' GROUP BY 1)
        SELECT coalesce(a.k, b.k) AS custkey,
               coalesce(a.n, 0) AS n_1995,
               coalesce(b.n, 0) AS n_1996,
               coalesce(b.n, 0) - coalesce(a.n, 0) AS delta
        FROM a FULL OUTER JOIN b ON a.k = b.k
        ORDER BY custkey
      """)),

    // ------------------------------------------------------------------
    // Pivot: events day × event_type counts (explicit value list keeps the
    // plan a single pass; dynamic pivot would need a values scan first).
    Q("q_pivot",
      (s, dir) => Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("day")),
      Some("""
        SELECT date_trunc('day', ts) AS day,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        FROM events GROUP BY 1 ORDER BY day
      """)),

    // ------------------------------------------------------------------
    // Exact percentiles (linear interpolation — same definition both
    // engines; rounded to dodge last-ulp formula differences).
    Q("q_percentile",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          min(col("value")).as("vmin"), max(col("value")).as("vmax"))
        .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               MIN(value) AS vmin, MAX(value) AS vmax
        FROM events GROUP BY event_type ORDER BY event_type
      """)),

    // ------------------------------------------------------------------
    // Winsorization — robust-statistics cleaning: clamp a metric to its
    // per-group [p05, p95] band before aggregating, so a few wild rows
    // can't own the mean. Cutoffs use percentile_disc (an ACTUAL data
    // value — first value with cume_dist ≥ q, same definition in both
    // engines), so the clamp compares real doubles with no interpolation
    // arithmetic to drift cross-engine. Scale shape: the cutoff table is
    // group-cardinality (broadcast back); clamp + sums are one narrow
    // pass; the only data-sized work is the per-group percentile sort.
    Q("t_winsorize",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val cuts = ev.groupBy(col("event_type")).agg(
          expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").as("lo"),
          expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").as("hi"))
        ev.join(broadcast(cuts), Seq("event_type"))
          .withColumn("wv", least(greatest(col("value"), col("lo")), col("hi")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum((col("value") < col("lo")).cast("long")).as("n_clip_lo"),
            sum((col("value") > col("hi")).cast("long")).as("n_clip_hi"),
            Q.dsum(col("wv")).as("sum_winsorized"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH cuts AS (
          SELECT event_type,
                 quantile_disc(value, 0.05) AS lo,
                 quantile_disc(value, 0.95) AS hi
          FROM events GROUP BY 1)
        SELECT e.event_type, COUNT(*) AS n,
               CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
               CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
               CAST(SUM(CAST(least(greatest(value, lo), hi) AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_winsorized
        FROM events e JOIN cuts c ON c.event_type = e.event_type
        GROUP BY e.event_type ORDER BY e.event_type
      """)),

    // ------------------------------------------------------------------
    // Outer-join aggregation: every customer, order stats defaulted to 0.
    Q("q_outer_agg",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), Q.dsum(col("o_totalprice")).as("sum_price"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_name"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("sum_price"), lit(0.0)).as("sum_price"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(sum_price, 0.0) AS sum_price
        FROM customer LEFT JOIN (
          SELECT o_custkey, COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          FROM orders GROUP BY o_custkey) o
        ON c_custkey = o_custkey
        ORDER BY c_custkey
      """)),

    // ------------------------------------------------------------------
    // Top-k per group via the custom TopKAgg aggregate (map-side bounded
    // heaps — only k rows per group per partition shuffle, vs. the window
    // form shuffling every row). Oracle proves equivalence to row_number.
    Q("q_topk_agg",
      (s, dir) => graft.operators.ScaleJoins.topKPerGroup(
          Tables.orders(s, dir), Seq("o_custkey"), "o_totalprice", "o_orderkey", k = 3)
        .orderBy(col("o_custkey"), col("rk")),
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          SELECT o_custkey, CAST(o_orderkey AS BIGINT) AS o_orderkey,
                 CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
          FROM orders)
        WHERE rk <= 3
        ORDER BY o_custkey, rk
      """)),

    // ------------------------------------------------------------------
    // Correlated scalar subquery: each customer with their max order price.
    Q("q_scalar_subquery",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("g_customer")
        Tables.orders(s, dir).createOrReplaceTempView("g_orders")
        s.sql("""
          SELECT c_custkey,
                 (SELECT MAX(o_totalprice) FROM g_orders
                  WHERE o_custkey = c_custkey) AS max_price
          FROM g_customer ORDER BY c_custkey""")
      },
      Some("""
        SELECT c_custkey,
               (SELECT MAX(o_totalprice) FROM orders
                WHERE o_custkey = c_custkey) AS max_price
        FROM customer ORDER BY c_custkey
      """)),

    // ------------------------------------------------------------------
    // Set operations: custkeys with orders in 1996 but none in 1997.
    Q("q_set_ops",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        def yr(y: Int) = o.filter(year(col("o_orderdate")) === y)
          .select(col("o_custkey"))
        yr(1996).intersect(yr(1996)).except(yr(1997))
          .orderBy(col("o_custkey"))
      },
      Some("""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        ORDER BY o_custkey
      """)),

    // ------------------------------------------------------------------
    // JSON extraction from the props payload (the inverse of extras-JSON).
    Q("t_json_extract",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id")),
      Some("""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events ORDER BY event_id
      """)),

    // ------------------------------------------------------------------
    // NATIVE as-of join: custom LogicalPlan + SparkStrategy + sort-merge
    // SparkPlan (graft.plans.AsOfJoin) — one co-partitioned merge pass,
    // O(1) state. Same semantics and oracle as the window-composed
    // q_asof_join.
    Q("q_asof_native",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val signups = e.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"))
        graft.operators.AsOf.join(purchases, signups,
            leftKey = "user_id", rightKey = "user_id",
            leftTs = "ts", rightTs = "ts")
          .filter(col("ts_r").isNotNull)
          .select(col("event_id"), col("user_id"), col("ts"), col("ts_r").as("signup_ts"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND s.ts <= p.ts
        ORDER BY p.event_id
      """)),

    // ------------------------------------------------------------------
    // Range join via time-bucketing: clicks inside each signup's 1-hour
    // window, counted per window. Oracle = DuckDB's native inequality join.
    Q("q_range_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val intervals = e.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("ts").as("w_start"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("ts"))
        // Aggregate contract → order-statistics plan (r11): the bucketed
        // pair join (RangeJoin.pointInInterval, still the operator when
        // pairs ARE the output) grows with click×signup density per time
        // bucket — the sf100 probe's compressed-timestamp regime blew its
        // intermediate up ~10⁶× while the count output grew 10³×.
        // countInInterval is C(<end)−C(<start) over signed endpoint
        // probes: three linear shuffles at ANY overlap density, same rows.
        RangeJoin.countInInterval(clicks, "ts", intervals,
            "w_start", "w_end", "signup_id")
          .withColumnRenamed("n_points", "n_clicks")
          .orderBy(col("signup_id"))
      },
      Some("""
        SELECT s.event_id AS signup_id, COUNT(*) AS n_clicks
        FROM (SELECT * FROM events WHERE event_type = 'signup') s
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.ts >= s.ts AND c.ts < s.ts + INTERVAL 1 HOUR
        GROUP BY 1 ORDER BY signup_id
      """)),

    // ------------------------------------------------------------------
    // Salted two-phase aggregation over a heavy-hitter key (5 event
    // types × ~2k rows each at sf0.01): partial agg on (key, salt) caps
    // the biggest reducer; the final agg merges partials. Salting is
    // result-neutral (decimal-exact sums), so the oracle is the plain
    // GROUP BY — exactly the point: same answer, skew-proof plan.
    Q("q_salted_agg",
      (s, dir) => graft.operators.ScaleJoins.saltedSumCount(
          Tables.events(s, dir), "event_type", "value", saltFactor = 8)
        .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY event_type
      """)),

    // ------------------------------------------------------------------
    // Runtime-bloom-pruned selective semi join: the ~4% of orders above
    // the price cut are folded into a Bloom filter (constant-size
    // per-partition sketches, treeAggregated) that is broadcast and
    // probed as a codegen'd predicate INSIDE the lineitem scan stage —
    // ~96% of the fact rows die map-side, before the semi join ever
    // sees them; the broadcast semi join then kills the Bloom's false
    // positives, so the result is exact. This is the runtime-filter
    // shape that matters at 100 TB: the fact-side scan emits only
    // might-match rows and NOTHING here shuffles the fact table (the
    // dim side is broadcast both as bloom bits and as the join hash
    // relation). Oracle = the plain semi join — same answer, pruned
    // plan, exactly like q_salted_agg's contract.
    Q("q_bloom_join",
      (s, dir) => {
        import org.apache.spark.sql.GraftBridge
        val sel = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 480000.0)
          // String keys: BloomMightContain probes UTF8String bytes, so
          // build and probe must agree on the encoding.
          .select(col("o_orderkey").cast("string").as("l_orderkey"))
        // Fixed generous capacity instead of pre-counting the dim side
        // (the count was a SECOND scan of the filtered dim before the
        // treeAggregate build — one extra job per run, and at a 100×
        // larger dim a real cost). 2^22 expected items @ 1% fpp ≈ 5 MB
        // of bits: broadcast-cheap, and it holds the ~1-2%-selective
        // predicate through the sf100 probe scale (150M orders → ~2-3M
        // selected). An overfull filter only raises the fp rate — the
        // broadcast semi join kills false positives, so correctness
        // never depends on the sizing.
        val bloom = sel.stat.bloomFilter("l_orderkey", 1L << 22, 0.01)
        val bc = s.sparkContext.broadcast(bloom)
        Tables.lineitem(s, dir)
          .withColumn("l_orderkey", col("l_orderkey").cast("string"))
          .filter(GraftBridge.column(graft.functions.BloomMightContain(
            GraftBridge.expression(col("l_orderkey")), bc)))
          .join(broadcast(sel), Seq("l_orderkey"), "left_semi")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            Q.dsum(col("l_extendedprice")).as("revenue"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM lineitem
        WHERE l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_totalprice > 480000.0)
        GROUP BY 1 ORDER BY l_returnflag
      """)),

    // ------------------------------------------------------------------
    // Peak concurrency per event type: max number of simultaneously open
    // 30-minute activity windows — the ±1 endpoint sweep, distributed
    // (RangeJoin.peakConcurrency). The naive formulation is a global
    // ordered scan (single-task window); here each group's endpoint
    // stream spreads over range-ordered slabs, the running sum is a
    // bounded within-slab window, and slab offsets come from a
    // ≤ #partitions frame — a 1000×-denser group cannot recreate the
    // one-task scan. ROWS frames on both engines: a RANGE frame would
    // hand every tie-peer the run total and inflate the max.
    Q("q_peak_concurrency",
      (s, dir) => {
        val iv = Tables.events(s, dir).select(col("event_type"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
        RangeJoin.peakConcurrency(iv, "w_start", "w_end", "event_type")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH d AS (
          SELECT event_type, ts AS t, 1 AS d FROM events
          UNION ALL
          SELECT event_type, ts + INTERVAL 30 MINUTE AS t, -1 AS d
          FROM events),
        r AS (SELECT event_type,
                     SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS running
              FROM d)
        SELECT event_type, CAST(MAX(running) AS BIGINT) AS peak
        FROM r GROUP BY 1 ORDER BY event_type
      """)),

    // ------------------------------------------------------------------
    // GLOBAL peak concurrency — the same ±1 endpoint sweep with ONE
    // group spanning the whole corpus: the adversarial regime for the
    // distributed sweep (q_peak_concurrency's event_type grouping gives
    // every group ~1/5 of the rows; here the single group IS the dense
    // group the r11 verdict asked to probe — a naive plan would put the
    // entire ordered scan on one task, while peakConcurrency's range-
    // partitioned slabs + bounded slab-offset window keep every window
    // under one partition's rows no matter how dense the group gets).
    // Registered (not probe-only) so the sf0.01 oracle pins the slab
    // algebra in exactly the regime the sf100 probe times.
    Q("q_peak_concurrency_global",
      (s, dir) => {
        val iv = Tables.events(s, dir).select(lit("all").as("g"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
        RangeJoin.peakConcurrency(iv, "w_start", "w_end", "g")
          .select(col("peak"))
      },
      Some("""
        WITH d AS (
          SELECT ts AS t, 1 AS d FROM events
          UNION ALL
          SELECT ts + INTERVAL 30 MINUTE AS t, -1 AS d FROM events),
        r AS (SELECT SUM(d) OVER (ORDER BY t, d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS running
              FROM d)
        SELECT CAST(MAX(running) AS BIGINT) AS peak FROM r
      """)),

    // ------------------------------------------------------------------
    // Interval-union length ("busy time") per event type: total
    // milliseconds covered by ≥1 open 30-minute activity window — the
    // third member of the order-statistics sweep family (peak asks for
    // max running count, union length for Σ gap·[run > 0]). Same slab
    // plan: range-ordered slabs, within-slab window, bounded slab-offset
    // frame — three linear shuffles at any overlap density, and the
    // total is tie-order INVARIANT (equal-ts rows contribute zero-length
    // gaps; the last tie row's running count is a commutative sum), so
    // both engines land the same integer whatever their tie order.
    Q("q_interval_union",
      (s, dir) => {
        val iv = Tables.events(s, dir).select(col("event_type"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
        RangeJoin.busyTime(iv, "w_start", "w_end", "event_type")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) AS t, 1 AS d FROM events
          UNION ALL
          SELECT event_type, epoch_ms(ts + INTERVAL 30 MINUTE) AS t, -1 AS d
          FROM events),
        r AS (SELECT event_type, t,
                     SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS running,
                     LEAD(t) OVER (PARTITION BY event_type ORDER BY t, d)
                       AS nxt
              FROM d)
        SELECT event_type,
               CAST(SUM(CASE WHEN running > 0 AND nxt IS NOT NULL
                             THEN nxt - t ELSE 0 END) AS BIGINT) AS busy_ms
        FROM r GROUP BY 1 ORDER BY event_type
      """)),

    // ------------------------------------------------------------------
    // Numeric band-join COUNT: how many parts price within [p−5, p+5) of
    // each part — the |a−b| ≤ δ self-join every pricing/anomaly pipeline
    // wants, and the classic quadratic trap (the naive inequality
    // self-join is O(n²) pairs even when only counts are needed). The
    // order-statistics plan is axis-agnostic: countInInterval never
    // converts to time, it range-partitions whatever orderable key it's
    // given, so count(band) = C(<hi) − C(<lo) in three linear shuffles
    // at ANY price-cluster density (a million same-priced parts cannot
    // recreate the pair blowup). IEEE ±5.0 offsets and the half-open
    // boundary are bit-identical in both engines; self-inclusion keeps
    // every part in the output (inner-join contract never empties it).
    Q("q_price_band",
      (s, dir) => {
        val parts = Tables.part(s, dir)
        val points = parts.select(col("p_retailprice").as("price"))
        val bands = parts.select(col("p_partkey"),
          (col("p_retailprice") - lit(5.0)).as("lo"),
          (col("p_retailprice") + lit(5.0)).as("hi"))
        RangeJoin.countInInterval(points, "price", bands, "lo", "hi",
            "p_partkey")
          .withColumnRenamed("n_points", "n_band")
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT a.p_partkey, COUNT(*) AS n_band
        FROM part a JOIN part b
          ON b.p_retailprice >= a.p_retailprice - 5.0
         AND b.p_retailprice <  a.p_retailprice + 5.0
        GROUP BY 1 ORDER BY a.p_partkey
      """)),

    // ------------------------------------------------------------------
    // Interval-OVERLAP count join — the fourth sweep-family member
    // (point-in-interval asks C(<e)−C(<s); overlap asks how many BASE
    // INTERVALS intersect each probe interval). Per signup's 1-hour
    // window, how many 30-minute click-activity windows overlap it:
    // n = C_clickstarts(< s.end) − C_clickends(≤ s.start) — the two
    // miss sets are disjoint, so two rank probes and one id join
    // replace the O(n·m) inequality pair join; six linear shuffles at
    // ANY overlap density (RangeJoin.overlapCount). The oracle is the
    // honest quadratic overlap join.
    Q("q_overlap_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("ts").as("c_start"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("c_end"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("ts").as("s_start"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("s_end"))
        RangeJoin.overlapCount(clicks, "c_start", "c_end",
            signups, "s_start", "s_end", "signup_id")
          .orderBy(col("signup_id"))
      },
      Some("""
        SELECT s.event_id AS signup_id, COUNT(*) AS n_overlap
        FROM (SELECT * FROM events WHERE event_type = 'signup') s
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.ts < s.ts + INTERVAL 1 HOUR
         AND c.ts + INTERVAL 30 MINUTE > s.ts
        GROUP BY 1 ORDER BY signup_id
      """))
  )
}
