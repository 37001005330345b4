"""EXPLAIN / EXPLAIN ANALYZE (InfluxDB 1.7+ surface): upstream's
result shape — one text column named ``QUERY PLAN`` — with Catalyst's
formatted physical plan as the body (this engine's honest equivalent
of upstream's shard/series plan description). ANALYZE executes and
prepends row-count + wall-time lines. Only SELECT is explainable,
per upstream."""

from __future__ import annotations

import datetime as dt

import pytest

from ciws_server_spark.plans.influxql import InfluxQLError, run_influxql


@pytest.fixture(scope="module")
def tables(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 6, 0), "A", 2.0),
            (dt.datetime(2024, 1, 1, 6, 30), "A", 4.0),
            (dt.datetime(2024, 1, 1, 7, 0), "B", 6.0),
        ],
        "time timestamp, host string, value double",
    )
    return {"m": df}


def test_explain_shape_and_content(spark, tables):
    out = run_influxql(
        spark, tables,
        "EXPLAIN SELECT mean(value) FROM m GROUP BY time(1h), host",
    )
    assert out.columns == ["QUERY PLAN"]
    text = "\n".join(r[0] for r in out.collect())
    # a bucketed aggregate must plan as a hash aggregate
    assert "Physical Plan" in text
    assert "HashAggregate" in text
    # EXPLAIN must not execute the statement — no EXECUTION lines
    assert "EXECUTION:" not in text


def test_explain_analyze_executes(spark, tables):
    out = run_influxql(
        spark, tables, "EXPLAIN ANALYZE SELECT value FROM m"
    )
    rows = [r[0] for r in out.collect()]
    assert rows[0] == "EXECUTION: rows=3"
    assert rows[1].startswith("EXECUTION: wall=")
    assert any("Physical Plan" in s for s in rows)


def test_explain_case_insensitive_and_semicolon(spark, tables):
    out = run_influxql(
        spark, tables, "explain analyze select value from m;"
    )
    assert out.columns == ["QUERY PLAN"]
    assert [r[0] for r in out.collect()][0] == "EXECUTION: rows=3"


def test_explain_only_select(spark, tables):
    for bad in [
        "EXPLAIN SHOW MEASUREMENTS",
        "EXPLAIN ANALYZE SHOW TAG KEYS",
        "EXPLAIN DELETE FROM m",
        "EXPLAIN DROP MEASUREMENT m",
    ]:
        with pytest.raises(InfluxQLError, match="only supports SELECT"):
            run_influxql(spark, tables, bad)
    with pytest.raises(InfluxQLError, match="INTO"):
        run_influxql(
            spark, tables, "EXPLAIN SELECT value INTO m2 FROM m"
        )


def test_explain_of_bad_select_raises_named(spark, tables):
    # the inner statement still goes through full plan-time validation
    with pytest.raises(InfluxQLError):
        run_influxql(spark, tables, "EXPLAIN SELECT pow(value) FROM m")
    with pytest.raises(InfluxQLError):
        run_influxql(spark, tables, "EXPLAIN SELECT nope( FROM m")
