"""Mergeable HLL sketch rollups (operators/sketches.py): accuracy vs
exact aggregates, exact mergeability, and the materialize/query split."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ciws_server_spark.operators import sketches as S
from ciws_server_spark.tables import table


def test_daily_sketches_accuracy(spark, sf_smoke):
    daily = S.daily_user_sketches(spark, sf_smoke)
    exact = (
        table(spark, sf_smoke, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
    )
    joined = daily.join(exact, ["day", "event_type"]).collect()
    assert joined
    for r in joined:
        # lgK=12 → ~1.6% standard error; allow 3σ ≈ 5%
        assert r["distinct_users_est"] == pytest.approx(
            r["exact"], rel=0.05
        )


def test_union_matches_whole_range_sketch(spark, sf_smoke):
    """Mergeability is EXACT: union of daily sketches estimates the
    same as one sketch built over the entire range."""
    daily = S.daily_user_sketches(spark, sf_smoke)
    merged = {
        r["event_type"]: r["distinct_users_est"]
        for r in S.union_user_sketches(daily).collect()
    }
    whole = {
        r["event_type"]: r["est"]
        for r in table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(S.LG_K))
            ).cast("long").alias("est")
        )
        .collect()
    }
    assert merged == whole

    # and the estimate is close to the exact per-type distinct count
    exact = {
        r["event_type"]: r["exact"]
        for r in table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for et, est in merged.items():
        assert est == pytest.approx(exact[et], rel=0.05)


def test_rollup_roundtrip_and_query_cost(spark, sf_smoke, tmp_path):
    """Materialized sketch table: binary column survives parquet; the
    span query touches sketch rows only (row count = days × types)."""
    S.save_sketch_rollup(spark, sf_smoke, str(tmp_path))
    stored = S.read_sketch_rollup(spark, str(tmp_path))
    n_sketch_rows = stored.count()
    n_events = table(spark, sf_smoke, "events").count()
    # rollup, not a copy: rows = days × types, independent of volume
    # (at the smoke SF events-per-group is small; the ratio widens
    # linearly with SF)
    assert n_sketch_rows < n_events
    n_days = stored.select("day").distinct().count()
    n_types = stored.select("event_type").distinct().count()
    assert n_sketch_rows <= n_days * n_types

    live = {
        (str(r["day"]), r["event_type"]): r["distinct_users_est"]
        for r in S.daily_user_sketches(spark, sf_smoke).collect()
    }
    from_disk = {
        (str(r["day"]), r["event_type"]): r["distinct_users_est"]
        for r in stored.collect()
    }
    assert from_disk == live

    merged = S.union_user_sketches(stored).collect()
    assert {r["event_type"] for r in merged} >= {"click", "view"}


def test_approx_quantiles_close_to_exact(spark, sf_smoke):
    got = {
        r["event_type"]: r["value_quantiles"]
        for r in S.approx_value_quantiles(spark, sf_smoke).collect()
    }
    # approx_percentile guarantees RANK error, not value error — the
    # right contract is that each answer sits between the exact
    # percentiles at p ± 2% (tail values can differ arbitrarily in
    # value space while being rank-adjacent)
    lo_hi = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array(0.48D, 0.88D, 0.97D))"
            ).alias("lo"),
            F.expr(
                "percentile(value, array(0.52D, 0.92D, 1.0D))"
            ).alias("hi"),
        )
        .collect()
    }
    for et, qs in got.items():
        lo, hi = lo_hi[et]
        for approx_v, lo_v, hi_v in zip(qs, lo, hi):
            assert lo_v <= approx_v <= hi_v
