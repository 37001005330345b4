"""Quiet-window 8-vs-32-core profile (VERDICT r15 asks #5 + #6).

r15's scaling block was read in contaminated windows: the ≈1-ratio
queries (crypto_hashes, dedup_exact, date_functions_orders,
ts_time_bucket_agg, cube_order_stats) and the <1 "impossible" ratios
(grouping_sets_orders 0.78, window_running_revenue 0.80,
pipeline_curated_corpus 0.32) needed one clean re-read before any
conclusion. This runner benches a query list at 32 and 8 cores,
ALTERNATING cpu counts across rounds (32,8,32,8) so regime drift shows
up as round-to-round disagreement rather than biased ratios, and keeps
each run's canary/load stamp in the artifact.

Usage: python tools/experiments/core_scaling_profile.py [sf_dir] [rounds] [q ...]
Writes tmp/CORE_SCALING_R16.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
QUERIES = sys.argv[3:] or [
    "pipeline_curated_corpus",
    "crypto_hashes",
    "dedup_exact",
    "date_functions_orders",
    "ts_time_bucket_agg",
    "cube_order_stats",
    "grouping_sets_orders",
    "window_running_revenue",
]


def run_bench(cpus: int) -> dict:
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus)}
    proc = subprocess.run(
        [sys.executable, "bench.py", "--sf-dir", SF_DIR, "--repeat", "3",
         *QUERIES],
        capture_output=True, text=True, cwd="/root/repo", timeout=1800,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    runs = []
    for r in range(ROUNDS):
        for cpus in (32, 8) if r % 2 == 0 else (8, 32):
            out = run_bench(cpus)
            runs.append({
                "round": r, "cpus": cpus,
                "queries": out["queries"], "cold": out["cold"],
                "canary": out.get("canary"),
                "load_suspect": out.get("load_suspect"),
                "inflated": out.get("inflated"),
            })
            print(f"# round {r} cpus {cpus}: "
                  + json.dumps(out["queries"]) + (
                      "  LOAD_SUSPECT" if out.get("load_suspect") else ""),
                  flush=True)
    # per-query ratio from the best (min) warm reading per cpu count —
    # min-of-runs absorbs one-sided transients the same way the bench's
    # own best-of-reps does
    best = {32: {}, 8: {}}
    for run in runs:
        for q, t in run["queries"].items():
            cur = best[run["cpus"]].get(q)
            best[run["cpus"]][q] = t if cur is None else min(cur, t)
    ratios = {
        q: round(best[8][q] / best[32][q], 2)
        for q in QUERIES if q in best[8] and q in best[32]
    }
    result = {
        "sf_dir": SF_DIR, "rounds": ROUNDS, "queries": QUERIES,
        "runs": runs, "best_warm": best, "ratio_8c_over_32c": ratios,
    }
    os.makedirs("tmp", exist_ok=True)
    with open("tmp/CORE_SCALING_R16.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(ratios))


if __name__ == "__main__":
    main()
