"""Oracle gate for EXTRA (non-driver-registered) queries.

The external driver verifies at most 50 queries per round, so the
registry keeps the SURVEY §2-critical set under that budget and parks
near-duplicate exercisers in each module's ``EXTRA``. This test runs
the SAME comparison the driver runs (row count, column names,
order-insensitive values) for every extra query at sf0.01, so the full
surface stays oracle-checked even though the driver only sees the
registered half.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


@pytest.fixture(scope="module")
def oracle_con(sf_smoke):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{sf_smoke}/{t}.parquet')"
        )
    yield con
    con.close()


def test_registry_fits_driver_budget():
    """Every registered query must be inside the driver's 50-entry
    correctness window (round 2 registered 65 and the driver silently
    skipped the last 15)."""
    qs = entrymod.queries()
    assert len(qs) <= 50, f"registry overflow: {len(qs)} > 50"
    # every registered query has an oracle (strong check, not rows-only)
    assert set(entrymod.oracle_sql().keys()) == set(qs.keys())


@pytest.mark.parametrize("name", sorted(entrymod.extra_queries().keys()))
def test_extra_query_matches_oracle(spark, sf_smoke, oracle_con, name):
    fn = entrymod.extra_queries()[name]
    sql = entrymod.extra_oracle_sql()[name]
    got = _canon(fn(spark, sf_smoke).toPandas())
    exp = _canon(oracle_con.execute(sql).df())
    assert list(got.columns) == list(exp.columns), name
    assert len(got) == len(exp), name
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype != e.dtype:
            g, e = g.astype(object), e.astype(object)
        neq = ~((g == e) | (g.isna() & e.isna()))
        assert not neq.any(), (
            f"{name}.{c}: {int(neq.sum())} mismatches, first at row"
            f" {int(neq.idxmax())}:"
            f" got={got[c].iloc[int(neq.idxmax())]!r}"
            f" exp={exp[c].iloc[int(neq.idxmax())]!r}"
        )
