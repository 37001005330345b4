"""Round-10 A/B: q18 and q8 — the two suite-tail queries that never
had a dedicated rewrite attempt (VERDICT r9 Next #3).

q18 hypothesis set (the 15M-group hash agg dominates at sf10):
  A  current plan (partial+final hash agg on l_orderkey, AQE joins)
  B  repartition(l_orderkey) BEFORE the groupBy — the map-side
     partial agg on near-unique keys builds a ~2M-entry hash table
     per task for almost no reduction; shuffling the raw (key, qty)
     pairs instead and aggregating once post-shuffle trades partial
     CPU for a similar-size shuffle of narrower rows.
  C  A + explicit F.broadcast(big) on both joins (is AQE already
     broadcasting the filtered agg output, and does forcing it
     change anything?)

q8: plan audit + one variant (pre-aggregate lineitem revenue per
orderkey before the orders join? — measured, not assumed).

Methodology: interleaved in ONE JVM, same count+hash fold bench.py
uses, 3 rounds, report per-variant medians + identity of the fold.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ciws_server_spark.session import get_spark
from ciws_server_spark.functions.scalar import fixed_point, unscale
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"


def fold(df):
    row = df.selectExpr(
        "count(*) AS n",
        f"bit_xor(xxhash64({', '.join(df.columns)})) AS h",
    ).collect()[0]
    return row["n"], row["h"]


def q18_variant(spark, mode: str):
    li = table(spark, SF_DIR, "lineitem")
    pre = li.select("l_orderkey", fixed_point("l_quantity", 2).alias("qe2"))
    if mode == "B":
        pre = pre.repartition(64, "l_orderkey")
    big = (
        pre.groupBy("l_orderkey")
        .agg(F.sum("qe2").alias("q_e2"))
        .where(F.col("q_e2") > 300 * 100)
        .withColumn("sum_qty_dec", unscale(F.col("q_e2"), 2))
    )
    if mode == "C":
        big = F.broadcast(big)
    orders = table(spark, SF_DIR, "orders")
    cust = table(spark, SF_DIR, "customer")
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


def main() -> None:
    spark = get_spark("q18-q8-ab")
    spark.range(1).count()
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "nation", "region"):
        table(spark, SF_DIR, t).count()

    from ciws_server_spark.operators.tpch_suite import (
        q8_national_market_share,
        q18_large_volume_customers,
    )

    variants = {
        "q18_A_current": lambda: q18_large_volume_customers(spark, SF_DIR),
        "q18_B_repart": lambda: q18_variant(spark, "B"),
        "q18_C_bcast": lambda: q18_variant(spark, "C"),
        "q8_current": lambda: q8_national_market_share(spark, SF_DIR),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    folds: dict[str, tuple] = {}
    for rnd in range(3):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            f = fold(fn())
            dt = time.perf_counter() - t0
            times[name].append(dt)
            prev = folds.setdefault(name, f)
            assert prev == f, f"{name}: fold drifted {prev} -> {f}"
            print(f"# r{rnd} {name}: {dt:.2f}s fold={f}", flush=True)
    print("\n== medians ==")
    for name, ts in times.items():
        print(f"{name}: {sorted(ts)[1]:.2f}s  (all: "
              + ", ".join(f"{t:.2f}" for t in ts) + ")")
    a, b = folds["q18_A_current"], folds["q18_B_repart"]
    print("q18 identity A==B==C:",
          a == b == folds["q18_C_bcast"])


if __name__ == "__main__":
    main()
