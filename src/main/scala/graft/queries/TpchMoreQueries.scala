package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Additional TPC-H-shaped relational coverage (SURVEY.md §2.2): bilateral
  * volume (Q7), returned-items ranking (Q10), shipmode classes (Q12),
  * promo share (Q14), large-order having (Q18). Same float discipline as
  * the rest: decimal-exact sums rendered as double.
  */
object TpchMoreQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(10,2)")
  private def revenue = sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
    .cast("double")

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Q7 shape: bilateral nation volume by year.
    Q("q7_volume",
      (s, dir) => {
        val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sk"))
          .join(broadcast(n2), col("c_nationkey") === col("ck"))
          .filter((col("supp_nation") === "NATION_9" && col("cust_nation") === "NATION_10") ||
                  (col("supp_nation") === "NATION_10" && col("cust_nation") === "NATION_9"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("int").as("l_year"))
          .agg(revenue.as("volume"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS volume
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
           OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9')
        GROUP BY 1, 2, 3
        ORDER BY supp_nation, cust_nation, l_year
      """)),

    // ------------------------------------------------------------------
    // Q10 shape: top returned-revenue customers.
    Q("q10_returned",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(revenue.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
      Some("""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
      """)),

    // ------------------------------------------------------------------
    // Q12-SHAPED band aggregation. The synthetic lineitem schema has no
    // l_shipmode/commitdate/receiptdate, so the CASE-band pattern groups
    // by l_linestatus instead — same plan shape, honest name.
    Q("q12_priority_bands",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("low_line_count"))
        .orderBy(col("l_linestatus")),
      Some("""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus ORDER BY l_linestatus
      """)),

    // ------------------------------------------------------------------
    // Q14 shape: conditional-share aggregation (promo revenue %).
    Q("q14_promo",
      (s, dir) => Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
        .agg(
          sum(when(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"),
              dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .otherwise(lit(0).cast("decimal(10,2)")))
            .cast("double").as("promo_revenue"),
          revenue.as("total_revenue")),
      Some("""
        SELECT CAST(SUM(CASE WHEN p_brand IN ('Brand#1','Brand#2','Brand#3')
                        THEN CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))
                        ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE) AS promo_revenue,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      """)),

    // ------------------------------------------------------------------
    // Q18 shape: HAVING over a grouped subquery (large orders).
    Q("q18_large_orders",
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(Q.dsum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 150)
        Tables.orders(s, dir)
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice, total_qty
        FROM orders
        JOIN (SELECT l_orderkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150) q
          ON o_orderkey = l_orderkey
        ORDER BY total_qty DESC, o_orderkey
      """))
  )
}
