"""Dump explain("formatted") for headline (or named) queries to a dir.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [sf_dir] [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query. AQE is disabled for
the dump (its placeholder plan hides join strategies and codegen ids),
matching tools/explain_audit.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    only = set(sys.argv[4:])
    os.makedirs(outdir, exist_ok=True)

    from ciws_server_spark import session as _session
    from ciws_server_spark.session import get_spark

    import bench

    _session.RUNTIME_CONF = {
        k: v
        for k, v in _session.RUNTIME_CONF.items()
        if not k.startswith("spark.sql.adaptive")
    }
    spark = get_spark("plan-dump")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    qs = bench.headline_queries()
    if only:
        cat, _ = bench.catalog_queries()
        qs = {n: cat[n] for n in only}
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # pragma: no cover
            plan = f"ERROR: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path)


if __name__ == "__main__":
    main()
