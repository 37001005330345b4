"""Decompose Spark's per-query floor (BENCH_NOTES §19 addendum 2).

Times, in ONE warm session, (a) a full trivial query (plan + exec),
(b) planning only (analysis → optimization → physical plan, no jobs),
(c) execution only on a pre-planned DataFrame. The gap between (a)
and (b)+(c) is Py4J/scheduling slack. Measured 2026-08:
full ≈ 347 ms = ~152 ms plan-side + ~181 ms execution constants for
crypto_hashes at sf1 — the quantitative basis for adjudicating the
sub-second sf1 ratio tail as floor-dominated.

Usage: python tools/experiments/per_query_floor_profile.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from ciws_server_spark.operators.tpch import crypto_hashes
from ciws_server_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf1"
CONSUME = (
    "count(*) n",
    "bit_xor(xxhash64(p_partkey,name_md5,name_sha256,keyed_sha256)) h",
)


def main():
    spark = get_spark("floor-profile")
    spark.sparkContext.setLogLevel("ERROR")
    df = crypto_hashes(spark, SF_DIR)
    df.selectExpr(*CONSUME).collect()  # warm

    variants = {
        "full (plan+exec)": lambda: crypto_hashes(spark, SF_DIR)
        .selectExpr(*CONSUME)
        .collect(),
        "plan only": lambda: crypto_hashes(spark, SF_DIR)
        .selectExpr(*CONSUME)
        ._jdf.queryExecution()
        .executedPlan(),
        "exec only (pre-planned df)": lambda: df.selectExpr(
            *CONSUME
        ).collect(),
    }
    for label, fn in variants.items():
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(
            f"{label:28s} median {sorted(ts)[2] * 1000:.0f}ms  "
            f"all {[f'{t * 1000:.0f}' for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
