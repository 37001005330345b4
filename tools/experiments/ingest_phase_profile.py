"""Per-phase ingest profile (r15, VERDICT r14 ask #5).

r14's staged-append rewrite claimed ~76 files/s in its own window but
the driver artifact recorded 46.6. This runner times each phase of
the batch ingest pass separately over the bench's own landing
generator, plus the end-to-end number, so the remaining constant can
be attributed (route write vs manifest write vs moves vs parse
planning) instead of guessed.

Usage: python tools/experiments/ingest_phase_profile.py [n_files] [reps]
Prints one JSON line; phases are per-rep lists (fresh landing dir per
rep, one shared JVM — job-launch overhead is part of what we measure,
JVM startup is not).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 200
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    import bench
    from ciws_server_spark.session import get_spark
    from ciws_server_spark.sources import residential, sinks

    spark = get_spark("ingest-phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_files": N_FILES, "reps": []}
    for rep in range(REPS):
        work = tempfile.mkdtemp(prefix="ingestprof-")
        try:
            landing = os.path.join(work, "landing")
            tables = os.path.join(work, "tables")
            archive = os.path.join(work, "archive")
            quar = os.path.join(work, "quar")
            stats = bench._gen_landing(landing, N_FILES, bench._INGEST_ROWS)

            t0 = time.perf_counter()
            points, manifest = residential.parse(spark, landing)
            t_parse = time.perf_counter()
            counts = sinks.route_residential(
                points, manifest, tables, batch_id=0
            )
            t_route = time.perf_counter()
            sinks.apply_pending_moves(spark, tables, archive, quar)
            t_moves = time.perf_counter()

            n_arch = len(os.listdir(archive))
            assert n_arch == stats["good_files"], (n_arch, stats)
            total = t_moves - t0
            out["reps"].append({
                "parse_build": round(t_parse - t0, 3),
                "route_write": round(t_route - t_parse, 3),
                "moves": round(t_moves - t_route, 3),
                "total": round(total, 3),
                "files_per_sec": round(N_FILES / total, 1),
            })
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
