"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given scale factor,
runs the matching DuckDB ``oracle_sql()`` on the same parquet files,
and compares row count, schema (column names), and order-insensitive
values (rows sorted, columns sorted by name — the driver's contract).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def main() -> int:
    from ciws_server_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    # registered (driver-verified) + extra (locally-verified) queries:
    # the replica sweeps both so nothing is ever oracle-unchecked
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    oracles = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}

    # The static multitable-LSH oracle SQL pins the gate-fixture plane
    # count; at corpora past the clamp-floor size (n > 1448) Spark's
    # adaptive plane count differs, so regenerate that SQL for the
    # actual corpus — otherwise this tool falsely fails those queries
    # on non-gate fixtures (e.g. sf0.1).
    from ciws_server_spark.operators.similarity import scale_oracles

    n_emb = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    overrides = scale_oracles(n_emb)
    if overrides:
        print(f"== adaptive-plane oracle override (n={n_emb}): "
              f"{sorted(overrides)}")
        oracles = {**oracles, **overrides}
    results: dict[str, str] = {}
    for name, fn in sorted(qs.items()):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = canon(fn(spark, SF_DIR).toPandas())
        except Exception:
            results[name] = "ERR-spark"
            print(f"== {name}: SPARK ERROR ==")
            traceback.print_exc(limit=4)
            continue
        if name not in oracles:
            results[name] = f"rows-only({len(got)})"
            print(f"== {name}: no oracle, rows={len(got)} [{time.time()-t0:.1f}s]")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception:
            results[name] = "ERR-oracle"
            print(f"== {name}: ORACLE ERROR ==")
            traceback.print_exc(limit=4)
            continue
        status = compare(name, got, exp)
        results[name] = status
        print(f"== {name}: {status} ({len(got)} rows) [{time.time()-t0:.1f}s]")

    n_pass = sum(1 for v in results.values() if v == "PASS")
    print(json.dumps(results, indent=0))
    print(f"\n{n_pass}/{len(results)} PASS")
    return 0 if n_pass == len(results) else 1


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    if list(got.columns) != list(exp.columns):
        print(f"   schema: got {list(got.columns)} != exp {list(exp.columns)}")
        return "FAIL-schema"
    if len(got) != len(exp):
        print(f"   rowcount: got {len(got)} != exp {len(exp)}")
        return "FAIL-rows"
    for c in got.columns:
        g, e = got[c], exp[c]
        try:
            if g.dtype != e.dtype:
                g = g.astype(object)
                e = e.astype(object)
            neq = ~((g == e) | (g.isna() & e.isna()))
        except Exception:
            neq = pd.Series([True] * len(g))
        if neq.any():
            i = int(neq.idxmax())
            print(
                f"   col {c!r}: {int(neq.sum())} mismatches; first at row {i}: "
                f"got={got[c].iloc[i]!r} exp={exp[c].iloc[i]!r} "
                f"(dtypes {got[c].dtype}/{exp[c].dtype})"
            )
            return f"FAIL-values:{c}"
    return "PASS"


if __name__ == "__main__":
    sys.exit(main())
