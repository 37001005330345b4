"""Round-12 evidence artifact: subscription forwarding under ingest
load (VERDICT r11 ask #7).

An ingest decade (200 → 2000 landed .lp files, multi-batch via
maxFilesPerTrigger) with THREE subscriptions attached — two ALL-mode
file:// destinations plus one ANY-mode subscription load-balancing
across two more — asserting upstream's delivery contract:

* zero dropped: every ingested point's line reaches BOTH ALL-mode
  destinations, and exactly one of the two ANY-mode destinations;
* zero duplicated: every line is unique per destination (points carry
  unique timestamps, so set-size == count catches any double-post);
* replay-safe: re-running the pass on the same checkpoint posts
  nothing new (checkpointed discovery = each file in exactly one
  batch, forwarding rides the batch).

Forwarding overhead = wall(pass with subscriptions) − wall(identical
pass without), same JVM, back-to-back — a relative number; absolute
walls depend on box load (recorded alongside).

Writes tmp/SUBSCRIPTION_SOAK.json.
Usage: python tools/experiments/subscription_soak.py [points...]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

POINTS = [int(a) for a in sys.argv[1:]] or [200, 2000]
LINES_PER_FILE = 20
SCHEMAS = {"campus_flow": {"flowRate": "float"}}


def land_files(landing: str, n_files: int) -> int:
    os.makedirs(landing)
    ts0 = 1704067200_000_000_000  # 2024-01-01 ns
    total = 0
    for i in range(n_files):
        lines = []
        for j in range(LINES_PER_FILE):
            ts = ts0 + (i * LINES_PER_FILE + j) * 1_000_000_000
            lines.append(
                f"campus_flow,buildingID=B{i % 8:02d} "
                f"flowRate={float(i * LINES_PER_FILE + j)} {ts}"
            )
            total += 1
        with open(os.path.join(landing, f"f{i:05d}.lp"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    return total


def dest_lines(dest: str) -> list[str]:
    out: list[str] = []
    for fp in sorted(glob.glob(os.path.join(dest, "*.lp"))):
        with open(fp) as fh:
            out.extend(s for s in fh.read().splitlines() if s.strip())
    return out


def run_pass(spark, landing, td, ckpt, forward: bool) -> float:
    from ciws_server_spark.streaming.ingest import stream_line_protocol

    t0 = time.perf_counter()
    q = stream_line_protocol(
        spark, landing, td, ckpt, SCHEMAS,
        max_files_per_trigger=50, forward_subscriptions=forward,
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def one_point(spark, n_files: int) -> dict:
    from ciws_server_spark.plans.influxql import run_influxql
    from ciws_server_spark.sources import sinks

    base = tempfile.mkdtemp(prefix=f"sub_soak_{n_files}_")
    try:
        landing = os.path.join(base, "landing")
        total = land_files(landing, n_files)
        d_all1 = os.path.join(base, "all1")
        d_all2 = os.path.join(base, "all2")
        d_any1 = os.path.join(base, "any1")
        d_any2 = os.path.join(base, "any2")

        # --- warm-up: first streaming pass in a JVM pays stream/
        # codegen setup; throw one away so A/B walls compare clean
        tdw = os.path.join(base, "tw")
        os.makedirs(tdw)
        run_pass(spark, landing, tdw, os.path.join(base, "ckw"),
                 forward=True)

        # --- baseline: identical pass, no subscriptions registered
        # (forward=True with no subs IS the production config); two
        # runs, keep the min
        base_wall = None
        for k in range(2):
            td0 = os.path.join(base, f"t0{k}")
            os.makedirs(td0)
            w = run_pass(
                spark, landing, td0, os.path.join(base, f"ck0{k}"),
                forward=True,
            )
            base_wall = w if base_wall is None else min(base_wall, w)

        # --- subscribed passes: two runs (fresh store + dests each),
        # min wall; assertions run on the LAST run's destinations
        sub_wall = None
        for k in range(2):
            for d in (d_all1, d_all2, d_any1, d_any2):
                shutil.rmtree(d, ignore_errors=True)
            td1 = os.path.join(base, f"t1{k}")
            os.makedirs(td1)
            run_influxql(
                spark, {},
                f'CREATE SUBSCRIPTION "s1" ON ciws."autogen" '
                f"DESTINATIONS ALL 'file://{d_all1}'",
                table_dir=td1,
            )
            run_influxql(
                spark, {},
                f'CREATE SUBSCRIPTION "s2" ON ciws."autogen" '
                f"DESTINATIONS ALL 'file://{d_all2}'",
                table_dir=td1,
            )
            run_influxql(
                spark, {},
                f'CREATE SUBSCRIPTION "s3" ON ciws."autogen" '
                f"DESTINATIONS ANY 'file://{d_any1}', 'file://{d_any2}'",
                table_dir=td1,
            )
            ckpt = os.path.join(base, f"ck1{k}")
            w = run_pass(spark, landing, td1, ckpt, forward=True)
            sub_wall = w if sub_wall is None else min(sub_wall, w)

        table_rows = sinks.read_table(spark, td1, "campus_flow").count()
        all1 = dest_lines(d_all1)
        all2 = dest_lines(d_all2)
        any1 = dest_lines(d_any1)
        any2 = dest_lines(d_any2)
        n_chunks = len(glob.glob(os.path.join(d_all1, "*.lp")))

        # zero dropped / zero duplicated, per contract
        assert table_rows == total, (table_rows, total)
        assert len(all1) == total and len(set(all1)) == total, (
            len(all1), len(set(all1)), total)
        assert len(all2) == total and len(set(all2)) == total
        assert len(any1) + len(any2) == total
        assert len(set(any1) | set(any2)) == total  # exactly-once
        assert not (set(any1) & set(any2)), "ANY double-posted"

        # replay: same checkpoint, nothing new lands or posts
        before = {d: len(dest_lines(d)) for d in (d_all1, d_all2)}
        run_pass(spark, landing, td1, ckpt, forward=True)
        after = {d: len(dest_lines(d)) for d in (d_all1, d_all2)}
        assert before == after, "replay re-posted batches"
        assert (
            sinks.read_table(spark, td1, "campus_flow").count() == total
        )

        return {
            "files": n_files,
            "points": total,
            "batches": -(-n_files // 50),
            "chunks_per_all_dest": n_chunks,
            "wall_no_subs_s": round(base_wall, 2),
            "wall_with_subs_s": round(sub_wall, 2),
            "forward_overhead_s": round(sub_wall - base_wall, 2),
            "overhead_pct": round(
                (sub_wall - base_wall) / base_wall * 100, 1
            ),
            "dropped": 0,
            "duplicated": 0,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    from ciws_server_spark.session import get_spark

    spark = get_spark("subscription-soak")
    rows = []
    for n in POINTS:
        row = one_point(spark, n)
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = {"points": rows, "lines_per_file": LINES_PER_FILE}
    os.makedirs("/root/repo/tmp", exist_ok=True)
    with open("/root/repo/tmp/SUBSCRIPTION_SOAK.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
