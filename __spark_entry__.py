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
    """One entry per implemented operator from SURVEY.md §2.

    Capped below the driver's 50-query verification budget; overflow
    operators live in ``extra_queries()`` and are oracle-checked by
    ``tests/test_extra_oracle.py`` with the same comparison.
    """
    return operators.registered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases).

    Queries without an entry here get the driver's weaker rows-only
    check (reserved for genuinely non-SQL-expressible operators).
    """
    reg = operators.registered_queries().keys()
    return {k: v for k, v in operators.all_oracles().items() if k in reg}


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Implemented-but-not-driver-registered queries (local oracle)."""
    return operators.extra_queries()


def extra_oracle_sql() -> dict[str, str]:
    reg = operators.extra_queries().keys()
    return {k: v for k, v in operators.all_oracles().items() if k in reg}
