"""Evidence run for the write/admin-plane mutation fuzz (judge r11
ask #4): N random sequences × M mutations each, every mutation applied
to BOTH the on-disk snapshot store and the pure-Python mirror, full
table state compared every 5 ops and at sequence end.

Reuses tests/test_influxql_mutation_fuzz.run_sequence verbatim (the
pytest seeds are a 3-sequence subset of this space).

Usage: python tools/experiments/mutation_fuzz_run.py [n_seqs] [ops_per_seq]
Writes tmp/MUTATION_FUZZ.json.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from ciws_server_spark.session import get_spark

from test_influxql_mutation_fuzz import run_sequence

N_SEQS = int(sys.argv[1]) if len(sys.argv) > 1 else 40
OPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30


def main() -> None:
    spark = get_spark("mutation-fuzz", master="local[8]",
                      shuffle_partitions=8)
    t0 = time.time()
    total_ops = 0
    op_counts: dict[str, int] = {}
    for seq in range(N_SEQS):
        seed = 1000 + seq
        with tempfile.TemporaryDirectory(prefix="mutfuzz_") as td:
            stats = run_sequence(spark, td, seed, OPS)
        total_ops += sum(stats.values())
        for k, v in stats.items():
            op_counts[k] = op_counts.get(k, 0) + v
        print(f"seq {seq} seed={seed}: OK ({sum(stats.values())} ops, "
              f"{time.time() - t0:.0f}s elapsed)", flush=True)
    out = {
        "sequences": N_SEQS,
        "ops_per_seq": OPS,
        "total_mutations": total_ops,
        "op_counts": op_counts,
        "mismatches": 0,  # any mismatch raises — reaching here = clean
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out, indent=1))
    with open("/root/repo/tmp/MUTATION_FUZZ.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
