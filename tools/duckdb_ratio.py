"""DuckDB-oracle wall-clock ratio for the headline query set.

The 2x-of-baseline gate is measured against the DuckDB oracle (the
reference publishes no wall numbers — BASELINE.md §absence). At sf0.1
Spark's ~0.3-0.5s fixed per-query cost dominates the comparison; this
tool reruns the same comparison at a larger SF (sf1 by default),
where compute dominates, so the ratio reflects engine work instead of
session overhead.

For each headline query: run the DuckDB oracle SQL best-of-N on the
same parquet files, forcing full evaluation with the same
count+hash consumption shape bench.py uses (no result transfer
timed on either side), and emit a per-query ratio table against a
bench.py JSON produced at the same sf dir.

Usage:
  python bench.py --sf-dir tmp/sf1 $(python -c "import bench; \
      print(' '.join(sorted(bench.headline_queries())))") > sf1_bench.json
  python tools/duckdb_ratio.py tmp/sf1 sf1_bench.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf1"
    bench_json = sys.argv[2] if len(sys.argv) > 2 else None
    # optional 3rd arg: denominator repeats (r12 §54 protocol used 4
    # stable readings for re-denomination passes)
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import bench as benchmod
    from ciws_server_spark import operators

    names = sorted(benchmod.headline_queries())
    if bench_json:
        # compare exactly the set the Spark bench ran (decade runs
        # bench a 7-query subset; default runs the 25 headliners)
        names = sorted(json.load(open(bench_json))["queries"])
    oracles = operators.all_oracles()

    # The registry's static multitable-LSH SQL pins the gate-fixture
    # plane count; beyond the gate sizes Spark adapts its plane count,
    # so regenerate that SQL for the actual corpus size — otherwise
    # the two engines compute different workloads AND answers.
    from ciws_server_spark.operators.similarity import scale_oracles

    n_emb = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    overrides = scale_oracles(n_emb)
    if overrides:
        print(
            f"# adaptive-plane oracle override for n={n_emb}: "
            f"{sorted(overrides)}",
            file=sys.stderr,
        )
        oracles = {**oracles, **overrides}

    con = duckdb.connect()
    con.execute(f"SET threads TO {32}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    duck: dict[str, float] = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        # same consumption as bench.py: count + a hash fold over every
        # result column, no full-result transfer to the client
        wrapped = (
            f"SELECT count(*) AS n, bit_xor(hash(COLUMNS(*))) "
            f"FROM ({sql}) _t"
        )
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            con.execute(wrapped).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck[name] = round(best, 3)
        print(f"# duckdb {name}: {duck[name]:.3f}s", file=sys.stderr)

    out = {"sf_dir": sf_dir, "duckdb": duck, "duckdb_total": round(sum(duck.values()), 3)}
    if bench_json:
        spark = json.load(open(bench_json))["queries"]
        ratios = {
            n: round(spark[n] / duck[n], 2)
            for n in duck
            if n in spark and duck[n] > 0
        }
        duck_sum = sum(duck[n] for n in ratios)
        out.update(
            spark={n: spark[n] for n in duck if n in spark},
            spark_total=round(sum(spark[n] for n in duck if n in spark), 3),
            ratio=ratios,
            # duck_sum can be 0 when every overlapping oracle rounds
            # to 0.000s (tiny SFs) — emit null rather than crash after
            # the measurements completed
            ratio_total=(
                round(sum(spark[n] for n in ratios) / duck_sum, 2)
                if duck_sum > 0
                else None
            ),
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
