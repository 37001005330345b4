"""Ingest-path decade: 200 → 2000 landed files (round-9 verdict ask
#5).

The reference's real workload is the loader cron pass over a growing
daily backlog; this measures whether the ingest pipeline amortizes a
10× larger backlog sublinearly (per-file cost should FALL as fixed
per-pass costs — stream setup, checkpoint, manifest job — spread over
more files).

Protocol: same as tools/decade_protocol.py — N fresh-JVM invocations
per point via ``bench.py --ingest-only``, median files/s per mode,
canary load flags carried through. Both modes (batch cron pass and
availableNow streaming pass) run in every invocation.

Usage: python tools/experiments/ingest_decade.py [n_inv] [out_json]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = [200, 2000]


def one_invocation(n_files: int) -> dict:
    proc = subprocess.run(
        [
            sys.executable, "bench.py", "--ingest-only",
            "--sf-dir", "/root/testdata/sf0.001",
            "--ingest-files", str(n_files),
        ],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench failed: {proc.stderr[-2000:]}")
    d = json.loads(proc.stdout.strip().splitlines()[-1])
    if "error" in d.get("ingest", {}):
        raise RuntimeError(d["ingest"]["error"])
    return {
        "ingest": d["ingest"],
        "load_suspect": d.get("load_suspect", False),
    }


def main() -> None:
    n_inv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = (
        sys.argv[2] if len(sys.argv) > 2
        else os.path.join(REPO, "tmp", "INGEST_DECADE.json")
    )
    # round-10: optional explicit points (e.g. "20000" for the next
    # decade) — merged into an existing artifact rather than
    # rewriting it, so 200/2000 medians survive a 20k-only run
    points = (
        [int(p) for p in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else POINTS
    )
    result: dict = {"points": {}, "n_invocations": n_inv}
    if os.path.exists(out_path):
        try:
            result["points"] = json.load(open(out_path)).get("points", {})
        except Exception:
            pass
    for n_files in points:
        per_mode: dict[str, list] = {"batch": [], "stream": []}
        suspects = 0
        for i in range(n_inv):
            r = one_invocation(n_files)
            suspects += bool(r["load_suspect"])
            for mode in ("batch", "stream"):
                per_mode[mode].append(r["ingest"][mode])
            line = ", ".join(
                f"{m}: {r['ingest'][m]['sec']:.2f}s "
                f"({r['ingest'][m]['files_per_sec']:.1f} f/s)"
                for m in ("batch", "stream")
            )
            print(
                f"# {n_files} files inv{i + 1}/{n_inv}: {line}"
                f"{' LOADED' if r['load_suspect'] else ''}",
                file=sys.stderr, flush=True,
            )
        result["points"][str(n_files)] = {
            mode: {
                "sec_median": round(
                    statistics.median(x["sec"] for x in per_mode[mode]), 3
                ),
                "files_per_sec_median": round(
                    statistics.median(
                        x["files_per_sec"] for x in per_mode[mode]
                    ), 2
                ),
                "rows_per_sec_median": round(
                    statistics.median(
                        x["rows_per_sec"] for x in per_mode[mode]
                    ), 1
                ),
                "sec_spread": [
                    min(x["sec"] for x in per_mode[mode]),
                    max(x["sec"] for x in per_mode[mode]),
                ],
            }
            for mode in ("batch", "stream")
        }
        result["points"][str(n_files)]["load_suspect_runs"] = suspects
    # decade ratios between every adjacent measured pair (200→2000,
    # 2000→20000, …): sublinear = ratio < 10
    sizes = sorted(int(k) for k in result["points"])
    result["decade_ratio"] = {
        f"{lo_n}->{hi_n}": {
            mode: round(
                result["points"][str(hi_n)][mode]["sec_median"]
                / result["points"][str(lo_n)][mode]["sec_median"],
                2,
            )
            for mode in ("batch", "stream")
        }
        for lo_n, hi_n in zip(sizes, sizes[1:])
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
