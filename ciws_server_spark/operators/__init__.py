"""Operator registry.

Each query module exposes ``QUERIES`` (name → callable(spark, sf_dir)),
``ORACLES`` (name → DuckDB SQL) and ``HEADLINE`` (bench set);
``__spark_entry__`` aggregates them via ``ALL_MODULES``. ``ops`` holds
the fleet-ops operators (file-listing inputs, tested in tests/).
"""

from . import (  # noqa: F401
    dedup,
    multimodal,
    ops,
    pipeline,
    similarity,
    text_analysis,
    timeseries,
    tpch,
)

#: Modules contributing to the driver's queries()/oracle_sql() registry.
ALL_MODULES = (
    dedup,
    multimodal,
    pipeline,
    similarity,
    text_analysis,
    timeseries,
    tpch,
)
