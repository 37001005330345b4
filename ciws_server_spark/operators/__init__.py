"""Operator registry.

Each query module exposes ``QUERIES`` (name → callable(spark, sf_dir)),
``ORACLES`` (name → DuckDB SQL), ``HEADLINE`` (bench set), and
optionally ``EXTRA`` — query names that stay OUT of the driver
registry because the external driver verifies at most 50 queries per
round; extras remain oracle-checked locally by
``tests/test_extra_oracle.py`` (the identical row/schema/value
comparison). ``__spark_entry__`` aggregates the registered set via
``ALL_MODULES``. ``ops`` holds the fleet-ops operators (file-listing
inputs, tested in tests/).

Registration order is coverage-critical-first (tpch + timeseries carry
the SURVEY §2 correctness gate) so that if the registered set ever
exceeds the driver's budget again, the tail that falls off is the
least critical — in round 2 ``tpch`` registered last and its final 15
queries were never driver-verified.
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
    tpch_suite,
)

#: Modules contributing to the driver's queries()/oracle_sql() registry.
ALL_MODULES = (
    tpch,
    tpch_suite,
    timeseries,
    dedup,
    similarity,
    text_analysis,
    multimodal,
    pipeline,
)


def registered_queries() -> dict:
    """name → callable for every driver-registered query (≤50)."""
    merged: dict = {}
    for mod in ALL_MODULES:
        extra = getattr(mod, "EXTRA", set())
        entries = {k: v for k, v in mod.QUERIES.items() if k not in extra}
        overlap = merged.keys() & entries.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        merged.update(entries)
    return merged


def extra_queries() -> dict:
    """name → callable for locally-verified (non-driver) queries."""
    merged: dict = {}
    for mod in ALL_MODULES:
        extra = getattr(mod, "EXTRA", set())
        missing = extra - mod.QUERIES.keys()
        if missing:
            raise ValueError(f"EXTRA names not in QUERIES: {sorted(missing)}")
        merged.update({k: v for k, v in mod.QUERIES.items() if k in extra})
    return merged


def all_oracles() -> dict:
    """name → DuckDB SQL for every query, registered or extra."""
    merged: dict = {}
    for mod in ALL_MODULES:
        merged.update(getattr(mod, "ORACLES", {}))
    return merged
