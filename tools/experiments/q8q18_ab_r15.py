"""q8/q18 A/B, r15 (VERDICT r14 ask #7): the two remaining >=4x
constants, re-attempted with the r14 playbook — interleaved one-JVM
variants, bit-identity asserted on every rep, and SAME-WINDOW DuckDB
denominators (the registered oracles) so the ratio can move for code
reasons only.

q18 variants:
  A current   — map-side partial agg on l_orderkey, AQE joins
  B repart    — shuffle raw (key, qty_e2) pairs before one post-
                shuffle agg (partial agg on near-unique keys builds
                big per-task tables for ~no reduction; r10 negative,
                retested on the fixed-point form)
q8 variants:
  A current   — broadcast dims, ASIA-customer semi-join prunes orders,
                lineitem->orders join left to AQE
  B bcast_ord — force broadcast(orders_asia) into the lineitem join:
                zero lineitem exchange before the partial aggregate
                (at sf10 the pruned orders side is ~15 MB; at the
                100 TB design point this fails the 8 GB cap, so if
                adopted it must stay size-conditional like the
                rowlocal threshold)

Usage: python tools/experiments/q8q18_ab_r15.py [sf_dir] [reps]
Writes tmp/Q8Q18_AB_R15.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def fold(df):
    row = df.selectExpr(
        "count(*) AS n",
        f"bit_xor(xxhash64({', '.join(df.columns)})) AS h",
    ).collect()[0]
    return row["n"], row["h"]


def med(v):
    return sorted(v)[len(v) // 2]


def duck_time(con, sql) -> float:
    t = time.perf_counter()
    con.sql(
        f"SELECT count(*), sum(hash(COLUMNS(*)::VARCHAR)) FROM ({sql})"
    ).fetchall()
    return time.perf_counter() - t


def q18_repart(spark, sf_dir):
    from ciws_server_spark.functions.scalar import fixed_point, unscale
    from ciws_server_spark.tables import table

    li = table(spark, sf_dir, "lineitem")
    pre = li.select(
        "l_orderkey", fixed_point("l_quantity", 2).alias("qe2")
    ).repartition("l_orderkey")
    big = (
        pre.groupBy("l_orderkey")
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
            F.round(F.col("sum_qty_dec").cast("double"), 2).alias(
                "sum_qty"
            ),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


def q8_bcast_orders(spark, sf_dir):
    from ciws_server_spark.functions.scalar import unscale
    from ciws_server_spark.operators.tpch_suite import _revenue_e4
    from ciws_server_spark.tables import table

    region = F.broadcast(
        table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    n_cust = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("nc_key"),
            F.col("n_regionkey").alias("nc_region"),
        )
    )
    n_supp = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("ns_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    part = F.broadcast(
        table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    )
    supplier = F.broadcast(table(spark, sf_dir, "supplier"))
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    cust = table(spark, sf_dir, "customer")
    cust_asia = F.broadcast(
        cust.join(n_cust, cust.c_nationkey == F.col("nc_key"))
        .join(region, F.col("nc_region") == region.r_regionkey)
        .select("c_custkey")
    )
    orders_asia = F.broadcast(
        orders.join(
            cust_asia, orders.o_custkey == cust_asia.c_custkey, "left_semi"
        ).select("o_orderkey", "o_orderdate")
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(n_supp, supplier.s_nationkey == F.col("ns_key"))
        .join(orders_asia, li.l_orderkey == orders_asia.o_orderkey)
    )
    rev_e4 = _revenue_e4()
    target_e4 = F.when(
        F.col("supp_nation") == "NATION_3", rev_e4
    ).otherwise(F.lit(0).cast("long"))
    partial = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.spark_partition_id().alias("_p"),
    ).agg(
        F.sum(target_e4).alias("s_target"),
        F.sum(rev_e4).alias("s_vol"),
    )

    def _stage2(col: str):
        return unscale(F.sum(F.col(col).cast("decimal(38,0)")), 4)

    return (
        partial.groupBy("o_year")
        .agg(
            F.round(
                _stage2("s_target") / _stage2("s_vol"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("q8q18-ab-r15")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ciws_server_spark.operators.tpch_suite import (
        q8_national_market_share,
        q18_large_volume_customers,
    )
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, t)}.parquet')"
        )
    oracles = {
        k: entry.oracle_sql()[k]
        for k in ("q8_national_market_share", "q18_large_volume_customers")
    }

    variants = {
        "q18_A_current": lambda: q18_large_volume_customers(spark, SF_DIR),
        "q18_B_repart": lambda: q18_repart(spark, SF_DIR),
        "q8_A_current": lambda: q8_national_market_share(spark, SF_DIR),
        "q8_B_bcast_ord": lambda: q8_bcast_orders(spark, SF_DIR),
    }
    # warm scans once so rep 0 isn't charged cold I/O
    from ciws_server_spark.tables import table as _tbl

    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "nation", "region"):
        _tbl(spark, SF_DIR, t).count()

    times = {k: [] for k in variants}
    folds = {}
    duck = {k: [] for k in oracles}
    for r in range(REPS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            f = fold(fn())
            dt = time.perf_counter() - t0
            times[name].append(round(dt, 3))
            prev = folds.setdefault(name, f)
            assert prev == f, f"{name}: fold drifted {prev} -> {f}"
            print(f"# r{r} {name}: {dt:.2f}s", flush=True)
        for q, sql in oracles.items():
            sec = duck_time(con, sql)
            duck[q].append(round(sec, 3))
            print(f"# r{r} duckdb {q}: {sec:.3f}s", flush=True)

    result = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "identity": {
            "q18": folds["q18_A_current"] == folds["q18_B_repart"],
            "q8": folds["q8_A_current"] == folds["q8_B_bcast_ord"],
        },
        "spark": {
            k: {"median": med(v), "all": v} for k, v in times.items()
        },
        "duckdb": {
            k: {"median": med(v), "all": v} for k, v in duck.items()
        },
    }
    os.makedirs("tmp", exist_ok=True)
    with open("tmp/Q8Q18_AB_R15.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v["median"] for k, v in result["spark"].items()}))
    spark.stop()


if __name__ == "__main__":
    main()
