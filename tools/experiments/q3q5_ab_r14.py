"""r14 A/B: attack the q3 (5.2-6.5x) / q5 (6.8-7.7x) sf10 constants.

VERDICT r13 ask #3 — the q22/q1 playbook: interleaved variants in ONE
JVM, bit-identity asserted against the shipped plan, fresh same-window
DuckDB denominators, regime anchors around the sweep. Artifact:
tmp/Q3Q5_AB_R14.json.

Variants
--------
q3_ship      the shipped plan (DECIMAL revenue, join -> group)
q3_fp        same join shape, long fixed-point revenue (scale-safe for
             q3 FOREVER: sums are per-order, <= ~7 rows each, so the
             partial can never approach 2^53 at ANY scale factor)
q3_preagg    fixed-point revenue pre-aggregated by l_orderkey BEFORE
             the orders join: the post-join groupBy shuffle disappears
             (rows already unique per order) and the orders join input
             shrinks to one row per qualifying order
q5_ship      the shipped selective-first plan (DECIMAL revenue)
q5_fp        same plan, long fixed-point revenue. Stage-1 partials are
             per (nation, input split): rev_e4 <= 1e9/row and a 2 GiB
             split is ~33M rows -> partial <= 3.3e16 << 2^63 (ANSI
             would be loud anyway); the final merge uses the exact
             decimal unscale, so > 2^53 totals stay exact.

Usage: python tools/experiments/q3q5_ab_r14.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession, functions as F

from ciws_server_spark.functions.scalar import fixed_point, unscale
from ciws_server_spark.operators import tpch
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
OUT = "tmp/Q3Q5_AB_R14.json"


def _rev_e4() -> F.Column:
    return fixed_point("l_extendedprice", 2) * (
        F.lit(100) - fixed_point("l_discount", 2)
    )


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
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(unscale(F.sum(_rev_e4()), 4), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q3_preagg(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(_rev_e4()).alias("rev_e4")
    )
    return (
        per_order.join(
            orders, per_order.l_orderkey == orders.o_orderkey
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("o_orderkey"),
            F.col("o_orderdate"),
            F.col("o_orderpriority"),
            F.round(unscale(F.col("rev_e4"), 4), 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q5_fp(spark, sf_dir):
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    supp_asia = F.broadcast(
        table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(supp_asia, li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(unscale(F.sum(_rev_e4()), 4), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def consume(df) -> float:
    t = time.perf_counter()
    df.selectExpr(
        "count(*) AS n",
        f"bit_xor(xxhash64({', '.join(df.columns)})) AS h",
    ).collect()
    return time.perf_counter() - t


def duck_time(con, sql) -> float:
    t = time.perf_counter()
    con.sql(f"SELECT count(*), sum(hash(COLUMNS(*)::VARCHAR)) FROM ({sql})").fetchall()
    return time.perf_counter() - t


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("q3q5-ab-r14")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, t)}.parquet')"
        )

    variants = {
        "q3_ship": tpch.q3_shipping_priority,
        "q3_fp": q3_fp,
        "q3_preagg": q3_preagg,
        "q5_ship": tpch.q5_local_supplier_volume,
        "q5_fp": q5_fp,
    }
    oracles = {
        "q3": tpch.ORACLES["q3_shipping_priority"],
        "q5": tpch.ORACLES["q5_local_supplier_volume"],
    }

    # bit-identity FIRST (cheap at this SF relative to the sweep)
    identity = {}
    base3 = tpch.q3_shipping_priority(spark, SF_DIR).collect()
    identity["q3_fp"] = q3_fp(spark, SF_DIR).collect() == base3
    identity["q3_preagg"] = q3_preagg(spark, SF_DIR).collect() == base3
    base5 = tpch.q5_local_supplier_volume(spark, SF_DIR).collect()
    identity["q5_fp"] = q5_fp(spark, SF_DIR).collect() == base5
    print("identity:", identity, flush=True)

    # interleaved timed sweep with per-round DuckDB denominators
    times: dict[str, list] = {k: [] for k in variants}
    duck: dict[str, list] = {k: [] for k in oracles}
    for r in range(REPS):
        for name, fn in variants.items():
            sec = consume(fn(spark, SF_DIR))
            times[name].append(round(sec, 3))
            print(f"rep{r} {name}: {sec:.3f}s", flush=True)
        for q, sql in oracles.items():
            sec = duck_time(con, sql)
            duck[q].append(round(sec, 3))
            print(f"rep{r} duckdb {q}: {sec:.3f}s", flush=True)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    result = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "identity": identity,
        "spark": {k: {"median": med(v), "all": v} for k, v in times.items()},
        "duckdb": {k: {"median": med(v), "all": v} for k, v in duck.items()},
        "ratios": {
            k: round(med(v) / med(duck[k[:2]]), 2)
            for k, v in times.items()
        },
    }
    os.makedirs("tmp", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["ratios"]))
    spark.stop()


if __name__ == "__main__":
    main()
