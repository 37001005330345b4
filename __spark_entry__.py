"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``ciws_server_spark.operators.*``; each operator
module exposes ``QUERIES`` (name → callable(spark, sf_dir)) and
``ORACLES`` (name → DuckDB SQL). This file is the union of those
registries — adding an operator to a module registers it here
automatically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ciws_server_spark import operators


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ciws_server_spark.operators.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in operators.ALL_MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        merged.update(mod.QUERIES)
    return merged


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases).

    Queries without an entry here get the driver's weaker rows-only
    check (reserved for genuinely non-SQL-expressible operators).
    """
    merged: dict[str, str] = {}
    for mod in operators.ALL_MODULES:
        merged.update(getattr(mod, "ORACLES", {}))
    return merged
