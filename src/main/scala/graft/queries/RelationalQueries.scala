package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Core relational/analytics workload (SURVEY.md §2.2).
  *
  * These verify the engine end-to-end on aggregation, multi-way joins,
  * windows, semi/anti joins, sessionization and as-of joins — the shapes the
  * reference pipeline's downstream consumers run. Scale notes per query:
  * dimension sides are `broadcast()` so the fact table never shuffles for
  * them; fact-fact joins shuffle once on the join key.
  */
object RelationalQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(10,2)")

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // TPC-H Q1 shape: single scan, map-side partial agg, tiny result.
    Q("q1_agg",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            Q.dsum(col("l_quantity")).as("sum_qty"),
            Q.dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
              * (lit(1) + dec(col("l_tax")))).cast("double").as("sum_charge"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2))) * (1 + CAST(l_tax AS DECIMAL(10,2)))) AS DOUBLE) AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """)),

    // ------------------------------------------------------------------
    // TPC-H Q3 shape: dim filter broadcast into fact-fact join, top-N.
    Q("q3_shipping",
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit("1999-03-15").cast("timestamp"))
        val l = Tables.lineitem(s, dir)
        l.join(broadcast(o.join(broadcast(c), col("o_custkey") === col("c_custkey"))),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
      """)),

    // ------------------------------------------------------------------
    // TPC-H Q5 shape: star join, every dim broadcast, one fact shuffle.
    Q("q5_local_supplier",
      (s, dir) => {
        val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        val n = Tables.nation(s, dir)
        val sup = Tables.supplier(s, dir)
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = Tables.lineitem(s, dir)
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c),
            col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
      """)),

    // ------------------------------------------------------------------
    // Window: top-3 orders per customer by totalprice (rank over shuffle-once).
    Q("q_window_rank",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
          .orderBy(col("o_custkey"), col("rk"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
        WHERE rk <= 3
        ORDER BY o_custkey, rk
      """)),

    // ------------------------------------------------------------------
    // Multi-level aggregation (ROLLUP) — partial-agg friendly.
    Q("q_rollup",
      (s, dir) => {
        Tables.orders(s, dir)
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"), Q.dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)),

    // ------------------------------------------------------------------
    // Semi/anti join: customers with no 'P'-status order (left anti).
    Q("q_semi_anti",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        ORDER BY c_custkey
      """)),

    // ------------------------------------------------------------------
    // Sessionization: gap > 30 min starts a new session. One shuffle on
    // user_id; lag() within the sorted partition — scales linearly.
    Q("q_events_sessionize",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        e.withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ms").isNull ||
                 unix_millis(col("ts")) - col("prev_ms") > 1800000L, 1).otherwise(0))
          .groupBy(col("user_id"))
          .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
          SELECT user_id,
                 CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
                      THEN 1 ELSE 0 END AS new_session
          FROM (SELECT user_id, ts,
                       LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS prev_ms
                FROM events))
        GROUP BY user_id
        ORDER BY user_id
      """)),

    // ------------------------------------------------------------------
    // The CUSTOM flatMapGroupsWithState sessionizer run in batch mode
    // (all data present → every session final) — puts the stateful
    // operator itself behind the DuckDB gate. Sessionize works at
    // millisecond precision (Timestamp.getTime), so the oracle lags on
    // epoch_ms; outputs are per-user aggregates (session timestamps
    // would re-expose ms-vs-µs representation differences, counts
    // don't).
    Q("q_sessionize_custom",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"))
          .as[graft.streaming.Sessionize.Event]
        graft.streaming.Sessionize.sessions(ev, gapMillis = 1800000L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM (
          SELECT user_id,
                 CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
                      THEN 1 ELSE 0 END AS new_session
          FROM (SELECT user_id, ts,
                       LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS prev_ms
                FROM events))
        GROUP BY user_id
        ORDER BY user_id
      """)),

    // ------------------------------------------------------------------
    // Tumbling-window aggregation over the event stream (batch form).
    Q("q_events_windowed",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("sum_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""
        SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY hour, event_type
      """)),

    // ------------------------------------------------------------------
    // As-of join: for each purchase, the user's most recent signup at or
    // before it. Implemented as a union + running `last` over one sort —
    // no range cross-product, scales to skew (vs. the naive inequality
    // join). DuckDB's native ASOF JOIN is the oracle.
    Q("q_asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("is_p"))
        val signups = e.filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"), col("ts"), lit(0).as("is_p"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_p"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        purchases.unionByName(signups)
          .withColumn("signup_ts",
            last(when(col("is_p") === 0, col("ts")), ignoreNulls = true).over(w))
          .filter(col("is_p") === 1 && col("signup_ts").isNotNull)
          .select(col("event_id"), col("user_id"), col("ts"), col("signup_ts"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND s.ts <= p.ts
        ORDER BY p.event_id
      """))
  )
}
