"""Round-12 evidence artifact: the snapshot store's commit-cost curve
(VERDICT r11 ask #8).

The delete-class commit hardlinks every untouched file of the current
version into the new snapshot build (``sinks._link_tree_except``) —
O(#table files) per commit. This pins the measured latency at
1k / 10k / 100k files (the judge's curve), compares the r11 loop
(per-file ``os.path.realpath`` membership test) against the r12 one
(direct path compare — ``current`` is canonical), and anchors one
end-to-end ``delete_points`` at each size so the walk's share of a
real commit is visible.

Layout per size: 32 partition dirs, files spread evenly, each file a
~1.2 KB real parquet (hardlinked fan-out from one seed file — inode
count is what the walk pays for, content is irrelevant to link()).

Writes tmp/COMMIT_COST.json.
Usage: python tools/experiments/commit_cost_curve.py [--e2e]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SIZES = [1_000, 10_000, 100_000]
N_PARTS = 32
E2E = "--e2e" in sys.argv


def build_version_dir(root: str, n_files: int) -> str:
    """root.v000000 with n_files tiny parquet files across N_PARTS
    buildingID partitions, plus the root symlink."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    v0 = root + ".v000000"
    os.makedirs(v0)
    seed = os.path.join(v0, "_seed.parquet")
    pq.write_table(
        pa.table({"time": pa.array([0], pa.timestamp("us")),
                  "flowRate": pa.array([1.0])}),
        seed,
    )
    seeds = []
    for p in range(N_PARTS):
        pdir = os.path.join(v0, f"buildingID=B{p:02d}", "date=2024-01-01")
        os.makedirs(pdir)
        # per-partition seed copy: ext4 caps hardlinks per inode at
        # ~65k, and per-partition counts stay well under that
        s = os.path.join(pdir, "part-seed.parquet")
        shutil.copy2(seed, s)
        seeds.append((pdir, s))
    i = 0
    while i < n_files:
        pdir, s = seeds[i % N_PARTS]
        os.link(s, os.path.join(pdir, f"part-{i:06d}.parquet"))
        i += 1
    os.remove(seed)
    for _pdir, s in seeds:
        os.remove(s)
    os.symlink(os.path.basename(v0), root)
    return v0


def old_walk(current: str, tmp: str, affected_real: set) -> int:
    """The r11 loop, verbatim shape: per-file realpath membership."""
    n = 0
    for dirpath, _dirs, files in os.walk(current):
        rel = os.path.relpath(dirpath, current)
        for fname in files:
            fp = os.path.join(dirpath, fname)
            if os.path.realpath(fp) in affected_real:
                continue
            dst_dir = tmp if rel == "." else os.path.join(tmp, rel)
            os.makedirs(dst_dir, exist_ok=True)
            try:
                os.link(fp, os.path.join(dst_dir, fname))
            except OSError:
                shutil.copy2(fp, os.path.join(dst_dir, fname))
            n += 1
    return n


def time_walk(fn, current, affected, reps=3) -> float:
    best = None
    for _ in range(reps):
        tmp = current + ".timing.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.perf_counter()
        fn(current, tmp, affected)
        dt = time.perf_counter() - t0
        shutil.rmtree(tmp, ignore_errors=True)
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    from ciws_server_spark.sources import sinks

    out = {"sizes": {}, "n_partitions": N_PARTS}
    base = tempfile.mkdtemp(prefix="commit_cost_")
    try:
        for n in SIZES:
            root = os.path.join(base, f"t{n}", "campus_flow")
            os.makedirs(os.path.dirname(root))
            v0 = build_version_dir(root, n)
            # one affected file per commit — the retention-tick shape
            affected = {
                os.path.join(
                    v0, "buildingID=B00", "date=2024-01-01",
                    "part-000000.parquet",
                )
            }
            new_s = time_walk(sinks._link_tree_except, v0, affected)
            old_s = time_walk(old_walk, v0, affected)
            row = {
                "files": n,
                "link_walk_s": round(new_s, 4),
                "r11_realpath_walk_s": round(old_s, 4),
                "us_per_file": round(new_s / n * 1e6, 2),
            }
            out["sizes"][str(n)] = row
            print(json.dumps(row), flush=True)

        if E2E:
            # end-to-end delete_points anchor (includes the Spark
            # predicate scan + survivor rewrite, dwarfing the walk)
            from ciws_server_spark.session import get_spark

            spark = get_spark("commit-cost-e2e")
            for n in (1_000, 10_000):
                td = os.path.join(base, f"e2e{n}")
                os.makedirs(td)
                root = os.path.join(td, "campus_flow")
                build_version_dir(root, n)
                t0 = time.perf_counter()
                removed = sinks.delete_points(
                    spark, td, "campus_flow",
                    "buildingID = 'B00' AND flowRate = 1.0",
                )
                dt = time.perf_counter() - t0
                out["sizes"][str(n)]["e2e_delete_s"] = round(dt, 2)
                out["sizes"][str(n)]["e2e_rows_removed"] = removed
                print(f"e2e {n}: {dt:.2f}s removed={removed}",
                      flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    os.makedirs("/root/repo/tmp", exist_ok=True)
    with open("/root/repo/tmp/COMMIT_COST.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
