"""As-of joins must return the MATCHED click's value even when that
value is null: ts and value ride one struct through a single
first/last(ignorenulls) window, so they cannot come from different
clicks (two independent ignorenulls windows would skip a null value
back/forward to another click, diverging from ASOF semantics)."""

from __future__ import annotations

import datetime as dt

import pytest


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: click(v=1.0) @0s, click(v=NULL) @10s, purchase @20s,
        # click(v=NULL) @30s, click(v=7.0) @40s
        (1, base, 101, "click", 1.0),
        (1, base + dt.timedelta(seconds=10), 102, "click", None),
        (1, base + dt.timedelta(seconds=20), 103, "purchase", 5.0),
        (1, base + dt.timedelta(seconds=30), 104, "click", None),
        (1, base + dt.timedelta(seconds=40), 105, "click", 7.0),
        # user 2: purchase with no clicks at all
        (2, base, 201, "purchase", 9.0),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    d = tmp_path_factory.mktemp("asof")
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_backward_matches_null_valued_click(spark, events_dir):
    from ciws_server_spark.operators.timeseries import ts_asof_join

    rows = {r["purchase_id"]: r for r in ts_asof_join(spark, events_dir).collect()}
    r = rows[103]
    # the as-of click is 102 (ts=10s) whose value is NULL — the value
    # must be that null, not click 101's 1.0
    assert r["last_click_ts"] == dt.datetime(2024, 1, 1, 0, 0, 10)
    assert r["last_click_value"] is None
    assert rows[201]["last_click_ts"] is None
    assert rows[201]["last_click_value"] is None


def test_forward_matches_null_valued_click(spark, events_dir):
    from ciws_server_spark.operators.timeseries import ts_asof_join_forward

    rows = {
        r["purchase_id"]: r
        for r in ts_asof_join_forward(spark, events_dir).collect()
    }
    r = rows[103]
    # next click is 104 (ts=30s, value NULL) — not 105's 7.0
    assert r["next_click_ts"] == dt.datetime(2024, 1, 1, 0, 0, 30)
    assert r["next_click_value"] is None
    assert rows[201]["next_click_ts"] is None


def test_nearest_matches_null_valued_click(spark, events_dir):
    from ciws_server_spark.operators.timeseries import ts_asof_join_nearest

    rows = {
        r["purchase_id"]: r
        for r in ts_asof_join_nearest(spark, events_dir).collect()
    }
    r = rows[103]
    # prev (10s away) and next (10s away) tie → earlier click wins;
    # its value is NULL and must be reported as such
    assert r["nearest_click_ts"] == dt.datetime(2024, 1, 1, 0, 0, 10)
    assert r["nearest_click_value"] is None
    assert rows[201]["nearest_click_ts"] is None
