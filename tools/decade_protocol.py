"""Fixed-protocol scale-decade measurement (round-8 verdict ask #4).

Replaces the round-7 "best per query across heterogeneous bench
invocations" methodology, which had selection-bias risk under the
box's ±30% single-JVM GC variance: best-of-N-across-different-runs can
flatter a regression.

Protocol (pinned, identical for every query and every scale):
  * N fresh JVM invocations per query (default 3), each
    ``python bench.py --sf-dir D --repeat 2 <query>`` — so each
    invocation contributes one warm (best-of-2-in-JVM) and one cold
    reading;
  * report the MEDIAN warm across invocations plus min/max spread;
  * carry bench.py's canary readings through, so a loaded box is
    visible per-invocation instead of silently skewing the table.

Usage: python tools/decade_protocol.py [sf_dir] [out_json] [n_inv] [q...]

With explicit query names, only those run, and the out_json MERGES:
existing per-query rows for other families are kept (each row is
stamped with the git HEAD it was measured at), so anchors accumulate
across sessions instead of overwriting.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The scale-decade families (one per operator family; BENCH_NOTES §2).
#: r9 extends the original 7 with the headline families the r8 verdict
#: flagged as uncovered — a super-linear stage in sessionize / as-of /
#: BPE-ish tokenize / cube / top-k would have been invisible to the
#: protocol (the r7 LSH quadratic was caught exactly by this run).
FAMILIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_lsh_multitable_buckets",
    "sim_ivf_trained_topk",
    "pipeline_curated_corpus",
    "window_running_revenue",
    "q1_pricing_summary",
    # r9 additions
    "ts_sessionize",
    "ts_asof_join",
    "text_tokenize_bpeish",
    "cube_order_stats",
    "topk_orders_per_segment",
    # late-r9 addition: M4 downsampling (single groupBy, struct MIN/MAX)
    "ts_m4_downsample",
    # late-r9 addition: distributed prefix sum (sequence packing)
    "pipeline_pack_sequences",
    # r11 additions: the r10 selector surface (judge r11 ask #5) —
    # two stacked rank windows / partial-agg max_by companions /
    # window nearest-rank percentile / metadata count-distinct scan
    "influxql_top_per_tag",
    "influxql_companion_selector",
    "influxql_percentile_companion",
    "influxql_show_cardinality",
    # r11 session-2 addition: chunk-granularity exact dedup (one
    # chunk-keyed shuffle + window, one doc_id agg — the new text op)
    "pipeline_chunk_dedup",
    # r12 additions (judge r11 ask #1): the PQ family, now
    # oracle-registered — codebook training scans + literal-LUT ADC
    # scoring; a super-linear stage in either would hide without a
    # decade row
    "sim_pq_topk",
    "sim_ivfpq_topk",
]


def one_invocation(sf_dir: str, query: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "bench.py", "--sf-dir", sf_dir, "--repeat", "2", query],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench {query} failed: {proc.stderr[-1000:]}")
    d = json.loads(proc.stdout.strip().splitlines()[-1])
    return {
        "warm": d["queries"][query],
        "cold": d["cold"][query],
        "load_suspect": d.get("load_suspect", False),
        "canary": d.get("canary", {}),
    }


def _git_head() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=REPO, timeout=10,
        ).stdout.strip()
    except Exception:
        return "unknown"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "tmp", "sf10")
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH_SF10.json")
    n_inv = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    subset = sys.argv[4:] or FAMILIES

    queries: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, dict] = {}
    if subset != FAMILIES and os.path.isfile(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        queries = dict(prev.get("queries", {}))
        cold = dict(prev.get("cold", {}))
        spread = dict(prev.get("spread", {}))
    head = _git_head()
    any_suspect = False
    for q in subset:
        runs = []
        for i in range(n_inv):
            r = one_invocation(sf_dir, q)
            runs.append(r)
            print(
                f"# {q} inv{i + 1}/{n_inv}: warm={r['warm']:.3f}s "
                f"cold={r['cold']:.3f}s"
                f"{' LOADED' if r['load_suspect'] else ''}",
                file=sys.stderr,
                flush=True,
            )
        warms = sorted(x["warm"] for x in runs)
        colds = sorted(x["cold"] for x in runs)
        queries[q] = round(statistics.median(warms), 3)
        cold[q] = round(statistics.median(colds), 3)
        spread[q] = {
            "warm_min": warms[0],
            "warm_max": warms[-1],
            "cold_min": colds[0],
            "cold_max": colds[-1],
            "n_invocations": n_inv,
            "load_suspect_runs": sum(x["load_suspect"] for x in runs),
            "code": head,
        }
        any_suspect = any_suspect or any(x["load_suspect"] for x in runs)

    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = -1.0
    result = {
        "metric": "headline_total_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "cold": cold,
        "cold_total": round(sum(cold.values()), 3),
        "sf": sf,
        "spread": spread,
        "load_suspect": any_suspect,
        "note": (
            f"fixed protocol: median warm across {n_inv} fresh-JVM "
            "invocations per query (each warm = best-of-2 in its JVM); "
            "spread records per-query min/max and per-invocation canary "
            "load flags (tools/decade_protocol.py)"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
