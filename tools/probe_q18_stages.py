#!/usr/bin/env python3
"""Driver-side stage attribution for the q18 sf100 residual (r12).

NOT part of the library — probe tooling like check.py. Times q18's
pipeline stages separately at two scale factors so the superlinear
component can be named instead of guessed: raw scan, the 600M-row
decimal hash agg, the HAVING filter + orders join, and the final
global sort (count() may eliminate the sort; the noop sink cannot).

Usage: python3 tools/probe_q18_stages.py <sfdir10> <sfdir100>
"""
import sys, time
from pyspark.sql import SparkSession, functions as F

def build(cpus=32, shuffle=256):
    return (SparkSession.builder.master(f"local[{cpus}]")
            .config("spark.driver.memory", "64g")
            .config("spark.sql.shuffle.partitions", str(shuffle))
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.ui.enabled", "false")
            .getOrCreate())

def t(label, fn):
    t0 = time.time()
    n = fn()
    print(f"[q18probe] {label}: {time.time()-t0:.1f}s rows={n}", flush=True)

def probe(spark, sfdir):
    li = spark.read.parquet(f"{sfdir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sfdir}/orders.parquet")
    print(f"== {sfdir} ==", flush=True)
    t("scan_count", lambda: li.count())
    dec = F.col("l_quantity").cast("decimal(18,2)")
    big = (li.groupBy("l_orderkey").agg(F.sum(dec).alias("total_qty"))
             .filter(F.col("total_qty") > 150))
    t("agg_dec", lambda: big.count())
    bigd = (li.groupBy("l_orderkey")
              .agg(F.sum(F.col("l_quantity")).alias("total_qty"))
              .filter(F.col("total_qty") > 150))
    t("agg_double", lambda: bigd.count())
    joined = (orders.join(big, orders.o_orderkey == big.l_orderkey)
              .select("o_orderkey", "o_custkey", "o_totalprice", "total_qty"))
    t("join_count", lambda: joined.count())
    srt = joined.orderBy(F.desc("total_qty"), "o_orderkey")
    t("sort_count", lambda: srt.count())
    t("sort_noop", lambda: srt.write.format("noop").mode("overwrite").save() or 0)

if __name__ == "__main__":
    spark = build()
    for d in sys.argv[1:]:
        probe(spark, d)
    spark.stop()
