"""A/B: does the q1-style long fixed-point rewrite help q3/q5?

Hypothesis: q3/q5 sum _revenue() as DECIMAL(30,6)*DECIMAL(30,6) per
post-join row — the same per-row BigDecimal allocation the q1 rewrite
eliminated. But unlike q1 (60M-row scan straight into the agg), q3/q5
are join-dominated: q3's filters leave few joined rows, q5 aggregates
~half of lineitem AFTER a 3-way fact join. This experiment interleaves
the current DECIMAL form and a long fixed-point variant in ONE JVM
(methodology: tools/experiments/README.md) to see if the agg is even
on the critical path before we commit to a rewrite.

Usage: python tools/experiments/q3q5_fixed_point_ab.py [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from ciws_server_spark.operators import tpch
from ciws_server_spark.functions.scalar import fixed_point, unscale
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def q3_fp(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev_e4 = fixed_point("l_extendedprice", 2) * (
        F.lit(100) - fixed_point("l_discount", 2)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(unscale(F.sum(rev_e4), 4), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q5_fp(spark, sf_dir):
    region = F.broadcast(
        table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    supplier = F.broadcast(table(spark, sf_dir, "supplier"))
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    rev_e4 = fixed_point("l_extendedprice", 2) * (
        F.lit(100) - fixed_point("l_discount", 2)
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (cust.c_nationkey == supplier.s_nationkey),
        )
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    partial = joined.groupBy(
        "n_name", F.spark_partition_id().alias("_p")
    ).agg(F.sum(rev_e4).alias("s_rev"))
    return (
        partial.groupBy("n_name")
        .agg(
            F.round(
                unscale(F.sum(F.col("s_rev").cast("decimal(38,0)")), 4), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def run(fn, spark):
    t = time.monotonic()
    n = fn(spark, SF_DIR).count()
    return time.monotonic() - t, n


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("q3q5-fp-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "q3_decimal": tpch.q3_shipping_priority,
        "q3_fixed": q3_fp,
        "q5_decimal": tpch.q5_local_supplier_volume,
        "q5_fixed": q5_fp,
    }
    # warm-up each once, then interleave REPS timed passes
    for name, fn in variants.items():
        w, n = run(fn, spark)
        print(f"warmup {name}: {w:.3f}s ({n} rows)", flush=True)
    times = {k: [] for k in variants}
    for r in range(REPS):
        for name, fn in variants.items():
            t, _ = run(fn, spark)
            times[name].append(t)
            print(f"rep{r} {name}: {t:.3f}s", flush=True)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"MEDIAN {name}: {ts[len(ts)//2]:.3f}s  (all {['%.3f'%x for x in ts]})")
    # value identity check
    for base, fixed in (("q3", "q3_fp"), ("q5", "q5_fp")):
        pass
    a = tpch.q3_shipping_priority(spark, SF_DIR).toPandas()
    b = q3_fp(spark, SF_DIR).toPandas()
    print("q3 identical:", a.equals(b))
    a = tpch.q5_local_supplier_volume(spark, SF_DIR).toPandas()
    b = q5_fp(spark, SF_DIR).toPandas()
    print("q5 identical:", a.equals(b))
    spark.stop()


if __name__ == "__main__":
    main()
