package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The remaining TPC-H query shapes (SURVEY.md §2.2), completing all 22.
  * The synthetic schema has no partsupp / commit-receipt dates / comments,
  * so shapes that need them are adapted honestly (named for the shape, not
  * the literal query): the lineitem (partkey, suppkey) bridge stands in
  * for partsupp, and ship-vs-order-date lateness for commit-vs-receipt.
  * Float discipline as everywhere: additive aggregates via decimal casts;
  * divisions happen on decimal-exact doubles (deterministic IEEE on both
  * engines); every query ends in a total order.
  */
object TpchRestQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(10,2)")
  private def dec18(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private def revenue = sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
    .cast("double")

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Q2 shape: join against a correlated per-group minimum (min-price
    // supplier per part; the lineitem bridge stands in for partsupp).
    Q("q2_min_cost_supplier",
      (s, dir) => {
        // The per-part min is unchanged by a filter on PART attributes, so
        // prune lineitem against the qualifying parts FIRST (broadcast
        // semi-side; p_size<10 keeps ~20%), then take the min via ONE
        // window over the pruned rows — one lineitem scan and one ~20%
        // shuffle, vs. the previous two full scans (full-table min agg +
        // offer side) self-joined on l_partkey. Dedup stays AFTER the
        // min filter: post-filter the pair set is tiny.
        import org.apache.spark.sql.expressions.Window
        val offers = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
          .join(broadcast(Tables.part(s, dir).filter(col("p_size") < 10)),
            col("l_partkey") === col("p_partkey"))
        offers
          .withColumn("min_price",
            min(col("l_extendedprice")).over(Window.partitionBy(col("l_partkey"))))
          .filter(col("l_extendedprice") === col("min_price"))
          .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .select(col("p_partkey"), col("s_suppkey"), col("s_name"), col("n_name"),
            col("min_price"))
          .distinct()
          .orderBy(col("p_partkey"), col("s_suppkey"))
      },
      Some("""
        SELECT p_partkey, s_suppkey, s_name, n_name, min_price
        FROM (SELECT DISTINCT l_partkey, l_suppkey, l_extendedprice FROM lineitem) o
        JOIN (SELECT l_partkey, MIN(l_extendedprice) AS min_price
              FROM lineitem GROUP BY 1) m
          ON o.l_partkey = m.l_partkey AND o.l_extendedprice = m.min_price
        JOIN part     ON o.l_partkey = p_partkey AND p_size < 10
        JOIN supplier ON o.l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        ORDER BY p_partkey, s_suppkey
      """)),

    // ------------------------------------------------------------------
    // Q4 shape: EXISTS-filtered priority counts (late shipment = shipped
    // more than 30 days after the order date).
    Q("q4_order_priority",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.join(Tables.lineitem(s, dir),
            col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        GROUP BY 1 ORDER BY o_orderpriority
      """)),

    // ------------------------------------------------------------------
    // Q8 shape: market share of one supplier nation inside a customer
    // region + part-type slice, by order year.
    Q("q8_market_share",
      (s, dir) => {
        val vol = (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .filter(year(col("o_orderdate")).between(1996, 1997))
          .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)
              .select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
            col("c_nationkey") === col("cnk"))
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)
              .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("snk"))
          .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_5", vol)
              .otherwise(lit(0).cast("decimal(10,2)"))).cast("double").as("nation_vol"),
            sum(vol).cast("double").as("total_vol"))
          .select(col("o_year"),
            round(col("nation_vol") / col("total_vol"), 6).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some("""
        SELECT o_year, round(nation_vol / total_vol, 6) AS mkt_share FROM (
          SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                          THEN CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))
                          ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE) AS nation_vol,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS total_vol
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN part     ON l_partkey = p_partkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE year(o_orderdate) BETWEEN 1996 AND 1997
            AND p_type = 'PROMO' AND r_name = 'EUROPE'
          GROUP BY 1)
        ORDER BY o_year
      """)),

    // ------------------------------------------------------------------
    // Q9 shape: profit by supplier nation × year (retail price stands in
    // for supply cost at a 50% margin).
    Q("q9_profit_proxy",
      (s, dir) => Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "STANDARD")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(
          (sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double") -
           sum(dec(col("p_retailprice")) * dec18(col("l_quantity"))).cast("double") / 2)
            .as("profit"))
        .orderBy(col("n_name"), col("o_year")),
      Some("""
        SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE)
               - CAST(SUM(CAST(p_retailprice AS DECIMAL(10,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / 2
                 AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_type = 'STANDARD'
        GROUP BY 1, 2
        ORDER BY n_name, o_year
      """)),

    // ------------------------------------------------------------------
    // Q11 shape: value concentration — groups whose value exceeds a
    // scalar-subquery fraction of the global total.
    Q("q11_value_concentration",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val perPart = li.groupBy(col("l_partkey"))
          .agg(sum(dec18(col("l_extendedprice"))).as("value_dec"))
        // Scale-invariant threshold: 1.5× the mean per-part value.
        // BOTH the total and the part count derive from the per-part
        // aggregation (r15): decimal addition is associative, so the
        // sum of per-part decimal sums equals the direct decimal total
        // bit-for-bit, and the group count equals countDistinct — which
        // removes the second full lineitem scan AND its count-distinct
        // expand; ReuseExchange shares the one per-part exchange between
        // the filter stream and the threshold subquery (2 lineitem
        // scans + 3 exchanges → 1 scan + 1 shared exchange).
        val total = perPart.agg(sum(col("value_dec")).cast("double").as("total"),
          count(lit(1)).as("n_parts"))
        perPart
          .select(col("l_partkey"), col("value_dec").cast("double").as("value"))
          .crossJoin(broadcast(total))
          .filter(col("value") > col("total") / col("n_parts") * 1.5)
          .select(col("l_partkey"), col("value"))
          .orderBy(col("value").desc, col("l_partkey"))
      },
      Some("""
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
        FROM lineitem
        GROUP BY 1
        HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) >
               (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(DISTINCT l_partkey)
                FROM lineitem) * 1.5
        ORDER BY value DESC, l_partkey
      """)),

    // ------------------------------------------------------------------
    // Q13 shape: customer order-count distribution over a filtered
    // LEFT OUTER join (customers with zero orders count in bucket 0).
    Q("q13_custdist",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
      """)),

    // ------------------------------------------------------------------
    // Q16 shape: distinct-supplier counts per part attribute triple,
    // excluding a brand and an anti-joined supplier blacklist.
    Q("q16_supplier_cnt",
      (s, dir) => {
        val bad = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey").as("bad_key"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
              .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 5)),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(bad), col("l_suppkey") === col("bad_key"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size <= 5
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      """)),

    // ------------------------------------------------------------------
    // Q17 shape: rows below a correlated per-part average-quantity
    // threshold (decimal-exact avg = decimal sum / count, in double).
    Q("q17_small_quantity",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val avgQty = li.groupBy(col("l_partkey").as("ap"))
          .agg((sum(dec18(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
        li.join(broadcast(Tables.part(s, dir).filter(col("p_brand") === "Brand#2")),
            col("l_partkey") === col("p_partkey"))
          .join(avgQty, col("l_partkey") === col("ap"))
          .filter(col("l_quantity") < col("avg_qty") * 0.2)
          .agg((sum(dec18(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
            count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n
        FROM lineitem l
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#2'
          AND l_quantity < 0.2 * (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                                  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      """)),

    // ------------------------------------------------------------------
    // Q20 shape: nested IN chain — suppliers who shipped a large quantity
    // of a part-type slice in a year window, listed with their nation.
    Q("q20_excess_supply",
      (s, dir) => {
        val heavy = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                  col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"))
          .agg(sum(dec18(col("l_quantity"))).cast("double").as("qty"))
          .filter(col("qty") > 400)
        Tables.supplier(s, dir)
          .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_name"), col("n_name"))
          .orderBy(col("s_name"))
      },
      Some("""
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_type = 'PROMO'
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 400)
        ORDER BY s_name
      """)),

    // ------------------------------------------------------------------
    // Q21 shape: suppliers who were the last to ship in multi-supplier
    // finished orders (the waiting-supplier pattern without receipt
    // dates: per-order max ship date stands in for the late lineitem).
    Q("q21_waiting_supplier",
      (s, dir) => {
        // ONE lineitem pass: repartition by orderkey up front so the
        // (orderkey, suppkey) aggregation, the per-order window (which
        // replaces a second scan + self-join), and the order semi-join
        // all reuse the same partitioning — a single wide exchange where
        // the naive two-agg + join formulation pays three. (Profiled at
        // sf0.1: the plan is scan → 1 exchange → partial+final agg →
        // sort+window → 2 broadcast joins → tiny final agg; the ~1.4 s
        // is the scan + the one wide sort over ~600k groups — no further
        // exchange to remove, measured floor.)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("l_orderkey"))
        Tables.lineitem(s, dir)
          .repartition(col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(col("l_shipdate")).as("max_ship"))
          .withColumn("n_supps", count(lit(1)).over(w))
          .withColumn("omax", max(col("max_ship")).over(w))
          .filter(col("n_supps") > 1 && col("max_ship") === col("omax"))
          // Broadcast the finished-order KEY SET: the semi side prunes to
          // one bigint column, so broadcasting it keeps the big side's
          // orderkey partitioning (no exchange + sort for a shuffled semi
          // join). At 100 TB the orders key set outgrows a broadcast —
          // drop the hint and this degrades to the shuffled semi join.
          .join(broadcast(Tables.orders(s, dir)
              .filter(col("o_orderstatus") === "F").select("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
          .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(10)
      },
      Some("""
        WITH ls AS (SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS max_ship
                    FROM lineitem GROUP BY 1, 2),
        po AS (SELECT l_orderkey, COUNT(*) AS n_supps, MAX(max_ship) AS omax
               FROM ls GROUP BY 1)
        SELECT s_name, COUNT(*) AS numwait
        FROM ls
        JOIN po USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE n_supps > 1 AND max_ship = omax
          AND l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
      """))
  )
}
