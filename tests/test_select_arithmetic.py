"""SELECT-item arithmetic: binary expressions over fields or over
aggregate calls, with optional AS aliasing (InfluxQL binary operators
+ - * / % ; raw fields and aggregate calls cannot mix in one
expression, per InfluxQL).
"""

from __future__ import annotations

import datetime as dt

import pytest

from ciws_server_spark.plans.influxql import InfluxQLError, run_influxql


@pytest.fixture(scope="module")
def tables(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 6, 0), "A", 2.0, 3.0),
            (dt.datetime(2024, 1, 1, 6, 30), "A", 4.0, 5.0),
            (dt.datetime(2024, 1, 1, 7, 0), "B", 6.0, 1.0),
        ],
        "time timestamp, buildingID string, hot double, cold double",
    )
    return {"flow": df}


def test_raw_field_arithmetic(spark, tables):
    got = run_influxql(spark, tables, "SELECT hot + cold FROM flow")
    assert got.columns == ["time", "hot_add_cold"]
    assert sorted(r[1] for r in got.collect()) == [5.0, 7.0, 9.0]
    got = run_influxql(
        spark, tables, "SELECT (hot + cold) / 2 AS avg2 FROM flow"
    )
    assert got.columns == ["time", "avg2"]
    assert sorted(r["avg2"] for r in got.collect()) == [2.5, 3.5, 4.5]


def test_plain_alias(spark, tables):
    got = run_influxql(spark, tables, 'SELECT hot AS h FROM flow')
    assert got.columns == ["time", "h"]


def test_aggregate_arithmetic(spark, tables):
    got = run_influxql(
        spark, tables,
        "SELECT mean(hot) + mean(cold) FROM flow GROUP BY time(1h)",
    ).collect()
    by_t = {r["time_bucket"]: r["mean_hot_add_mean_cold"] for r in got}
    assert by_t[dt.datetime(2024, 1, 1, 6)] == pytest.approx(7.0)
    assert by_t[dt.datetime(2024, 1, 1, 7)] == pytest.approx(7.0)
    # combined with a plain aggregate item, tags, and aliasing
    got = run_influxql(
        spark, tables,
        "SELECT mean(hot) / mean(cold) AS ratio, count(hot) "
        "FROM flow GROUP BY time(1h), buildingID",
    )
    assert set(got.columns) == {
        "time_bucket", "buildingID", "ratio", "count_hot"
    }
    rows = {(r["buildingID"]): r["ratio"] for r in got.collect()}
    assert rows["A"] == pytest.approx(3.0 / 4.0)
    assert rows["B"] == pytest.approx(6.0)


def test_same_component_computed_once_and_scalar_ops(spark, tables):
    got = run_influxql(
        spark, tables, "SELECT max(hot) - min(hot) AS spread2 FROM flow"
    ).collect()
    assert got[0]["spread2"] == pytest.approx(4.0)
    got = run_influxql(spark, tables, "SELECT sum(hot) - 1 FROM flow")
    assert got.collect()[0]["sum_hot_sub_1"] == pytest.approx(11.0)


def test_mixing_raw_and_aggregate_raises(spark, tables):
    with pytest.raises(InfluxQLError, match="mix"):
        run_influxql(spark, tables, "SELECT hot + mean(cold) FROM flow")
    with pytest.raises(InfluxQLError, match="mix"):
        run_influxql(
            spark, tables,
            "SELECT hot + cold, mean(hot) FROM flow GROUP BY time(1h)",
        )


def test_parse_errors_are_named(spark, tables):
    with pytest.raises(InfluxQLError, match="dangling operator"):
        run_influxql(spark, tables, "SELECT hot + FROM flow")
    # multi-arg calls (percentile) don't compose — the tokenizer
    # rejects the whole item with a named error
    with pytest.raises(InfluxQLError, match="select expression"):
        run_influxql(
            spark, tables,
            "SELECT percentile(hot, 95) + 1 FROM flow",
        )
