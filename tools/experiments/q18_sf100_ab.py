"""q18 at sf100: confirm the r15 repartition form at scale or revert
(VERDICT r15 ask #3 / What's wrong #4).

The r15 adoption traded map-side partial aggregation for shuffling the
raw 16-byte (l_orderkey, qty_e2) pairs, on the asymptotic argument that
TPC-H's ~4 lineitems/order scatter leaves ~1.1 rows/key per map task —
the partial agg shrinks the exchange <10% while paying a per-task hash
table. The sf10 evidence was weak-positive (12/19 paired wins, pooled
medians within noise); this runner is the one clean decade-up
measurement the judge asked for.

Variants, order-alternating each round, one JVM, bit-identity asserted
on every rep:
  A shipped — q18_large_volume_customers (repartition form, r15)
  B mapagg  — the pre-r15 form: plain groupBy, map-side partial agg

Usage: python tools/experiments/q18_sf100_ab.py [sf_dir] [reps]
Writes tmp/Q18_SF100_AB.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf100"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def fold(df):
    row = df.selectExpr(
        "count(*) AS n",
        f"bit_xor(xxhash64({', '.join(df.columns)})) AS h",
    ).collect()[0]
    return row["n"], row["h"]


def med(v):
    return sorted(v)[len(v) // 2]


def q18_mapagg(spark, sf_dir):
    """The pre-r15 q18: no repartition — the groupBy plans a map-side
    partial aggregate over the scan splits, then exchanges partials."""
    from ciws_server_spark.functions.scalar import fixed_point, unscale
    from ciws_server_spark.tables import table

    li = table(spark, sf_dir, "lineitem")
    big = (
        li.select("l_orderkey", fixed_point("l_quantity", 2).alias("qe2"))
        .groupBy("l_orderkey")
        .agg(F.sum("qe2").alias("q_e2"))
        .where(F.col("q_e2") > 300 * 100)
        .withColumn("sum_qty_dec", unscale(F.col("q_e2"), 2))
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice",
            F.round(F.col("sum_qty_dec").cast("double"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("q18-sf100-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ciws_server_spark.operators.tpch_suite import (
        q18_large_volume_customers,
    )
    from ciws_server_spark.tables import table as _tbl

    variants = {
        "A_shipped_repart": lambda: q18_large_volume_customers(spark, SF_DIR),
        "B_mapagg": lambda: q18_mapagg(spark, SF_DIR),
    }
    for t in ("lineitem", "orders", "customer"):
        _tbl(spark, SF_DIR, t).count()  # warm file listing / footer reads

    times = {k: [] for k in variants}
    folds = {}
    order = list(variants)
    for r in range(REPS):
        for name in order:
            spark.sparkContext.setJobDescription(f"q18-sf100 {name} r{r}")
            t0 = time.perf_counter()
            f = fold(variants[name]())
            dt = time.perf_counter() - t0
            times[name].append(round(dt, 3))
            prev = folds.setdefault(name, f)
            assert prev == f, f"{name}: fold drifted {prev} -> {f}"
            print(f"# r{r} {name}: {dt:.2f}s", flush=True)
        order.reverse()  # alternate execution order round by round

    ident = folds["A_shipped_repart"] == folds["B_mapagg"]
    paired = [
        round(a - b, 3)
        for a, b in zip(times["A_shipped_repart"], times["B_mapagg"])
    ]
    result = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "identity": ident,
        "fold": list(folds["A_shipped_repart"]),
        "spark": {k: {"median": med(v), "min": min(v), "all": v}
                  for k, v in times.items()},
        "paired_delta_A_minus_B": paired,
        "A_wins": sum(1 for d in paired if d < 0),
    }
    os.makedirs("tmp", exist_ok=True)
    with open("tmp/Q18_SF100_AB.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v["median"] for k, v in result["spark"].items()}
                     | {"identity": ident, "A_wins": result["A_wins"]}))
    spark.stop()


if __name__ == "__main__":
    main()
