"""The PROCEDURALIZED sf1 gate (VERDICT r9 Next #4).

Round-9 showed the single-window sf1 ratio flips across the 2× gate
with ambient regime (1.61× quiet vs 2.30× busy on identical plans and
DuckDB denominators). The gate number is therefore defined as the
MEDIAN OF ≥3 PROTOCOL WINDOWS spread across the round, each window
being the pinned protocol:

  * Spark side: per-query MEDIAN of 3 fresh-JVM ``bench.py`` runs
    over the 25-headliner set at the sf1 fixture;
  * DuckDB side: best-of-2 of the same oracles in the SAME window
    (``tools/duckdb_ratio.py``);
  * plus the window's regime anchors (``bench.measure_anchors``) so
    each window self-reports how loaded the box was.

Each invocation appends one window to ``tmp/RATIO_SF1_WINDOWS.json``
and rewrites ``RATIO_SF1.json`` as the aggregate: per-window ratio
totals, the median-of-windows headline, and anchor context. Two
people running this across different hours land on the same side of
the gate or see, in the artifact, why they didn't.

Usage: python tools/ratio_windows.py [sf_dir]   # default tmp/sf1
       python tools/ratio_windows.py --aggregate-only
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOWS_FILE = os.path.join(REPO, "tmp", "RATIO_SF1_WINDOWS.json")
GATE_FILE = os.path.join(REPO, "RATIO_SF1.json")
N_SPARK_RUNS = 3


def _run_bench(sf_dir: str, names: list[str]) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "bench.py"),
        "--sf-dir", sf_dir, "--no-ingest", *names,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, check=True,
        timeout=1800,
    )
    parsed = json.loads(out.stdout.strip().splitlines()[-1])
    # r15: the compact stdout line sheds "anchor" FIRST under its
    # 1900-char budget — at sf1 the 25-query line always overflows, so
    # every window recorded anchors as {} and the aggregate's
    # regime_index degraded to exactly 1.0 (the r14 "blind anchors").
    # Recover the shed fragments from the full sidecar this run wrote.
    try:
        with open(os.path.join(REPO, "tmp", "BENCH_FULL.json")) as f:
            full = json.load(f)
        for k in ("anchor", "inflation", "canary", "load_suspect"):
            if k not in parsed and k in full:
                parsed[k] = full[k]
    except (OSError, ValueError):
        pass
    return parsed


def measure_window(sf_dir: str) -> dict:
    import bench as benchmod

    names = sorted(benchmod.headline_queries())
    runs = [_run_bench(sf_dir, names) for _ in range(N_SPARK_RUNS)]
    spark = {
        n: round(statistics.median(r["queries"][n] for r in runs), 3)
        for n in names
    }
    bench_file = os.path.join(REPO, "tmp", "_ratio_window_bench.json")
    with open(bench_file, "w") as f:
        json.dump({"queries": spark}, f)
    duck_out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "duckdb_ratio.py"),
            sf_dir, bench_file,
        ],
        capture_output=True, text=True, cwd=REPO, check=True, timeout=1800,
    )
    ratio = json.loads(duck_out.stdout.strip().splitlines()[-1])
    anchors = [r.get("anchor", {}) for r in runs]
    return {
        "ts": time.time(),
        "iso": time.strftime("%Y-%m-%d %H:%M:%S"),
        "sf_dir": sf_dir,
        "spark_runs_total": [r["value"] for r in runs],
        "spark_median": spark,
        "spark_total": ratio.get("spark_total"),
        "duckdb": ratio.get("duckdb"),
        "duckdb_total": ratio.get("duckdb_total"),
        "ratio": ratio.get("ratio"),
        "ratio_total": ratio.get("ratio_total"),
        "anchors": anchors,
        "load_suspect": any(r.get("load_suspect") for r in runs),
    }


def aggregate() -> dict:
    windows = []
    if os.path.exists(WINDOWS_FILE):
        windows = json.load(open(WINDOWS_FILE))
    ratios = [w["ratio_total"] for w in windows if w.get("ratio_total")]
    med = round(statistics.median(ratios), 2) if ratios else None
    gate = {
        "metric": "sf1_headline_ratio_vs_duckdb",
        "value": med,
        "definition": (
            f"median of {len(ratios)} protocol windows (each: per-query "
            f"median of {N_SPARK_RUNS} fresh-JVM bench runs vs best-of-2 "
            "DuckDB in the same window); windows with full per-query "
            "detail in tmp/RATIO_SF1_WINDOWS.json"
        ),
        "windows": [
            {
                "iso": w["iso"],
                "ratio_total": w["ratio_total"],
                "spark_total": w["spark_total"],
                "duckdb_total": w["duckdb_total"],
                "regime_index": max(
                    (a.get("regime_index", 1.0) for a in w.get("anchors", [])
                     if isinstance(a, dict)),
                    default=None,
                ),
                "load_suspect": w.get("load_suspect"),
            }
            for w in windows
        ],
        "note": (
            "The r9 lesson: a single window straddles the 2x gate with "
            "ambient regime (1.61 quiet / 2.30 busy on identical plans "
            "and DuckDB denominators). The gate number is the median of "
            ">=3 windows spread across the round; per-window anchors "
            "(bench.py regime_index) record how loaded each window was."
        ),
    }
    with open(GATE_FILE, "w") as f:
        json.dump(gate, f, indent=1)
    return gate


def main() -> None:
    if "--aggregate-only" not in sys.argv:
        sf_dir = next(
            (a for a in sys.argv[1:] if not a.startswith("--")),
            os.path.join(REPO, "tmp", "sf1"),
        )
        w = measure_window(sf_dir)
        windows = []
        if os.path.exists(WINDOWS_FILE):
            windows = json.load(open(WINDOWS_FILE))
        windows.append(w)
        os.makedirs(os.path.dirname(WINDOWS_FILE), exist_ok=True)
        with open(WINDOWS_FILE, "w") as f:
            json.dump(windows, f, indent=1)
        print(f"# window {len(windows)}: ratio_total={w['ratio_total']}")
    print(json.dumps(aggregate()))


if __name__ == "__main__":
    main()
