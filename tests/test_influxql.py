"""InfluxQL front-end: the reference's exercised query shape + the
time-bucket aggregation surface, translated to DataFrame plans."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def flow(spark):
    base = dt.datetime(2021, 3, 1)
    rows = []
    for b in ("A", "B"):
        for i in range(120):
            rows.append(
                (base + dt.timedelta(minutes=i), b, float(i % 7), float(i))
            )
    return spark.createDataFrame(
        rows, ["time", "buildingID", "hotOutFlowRate", "coldInFlowRate"]
    )


def test_reference_exercised_shape(spark, flow):
    """The one query the reference issues (tag + closed time range)."""
    from ciws_server_spark.plans.influxql import query_measurement

    q = (
        "SELECT \"hotOutFlowRate\", \"buildingID\" FROM \"flow\" "
        "WHERE \"buildingID\" = 'A' "
        "AND time >= '2021-03-01 00:10:00' AND time <= '2021-03-01 00:20:00'"
    )
    got = query_measurement(spark, {"flow": flow}, q)
    rows = got.collect()
    assert got.columns == ["time", "hotOutFlowRate", "buildingID"]
    assert len(rows) == 11  # closed range, minute cadence
    assert {r["buildingID"] for r in rows} == {"A"}


def test_time_bucket_aggregation(spark, flow):
    """GROUP BY time(1h), tag with mean/count/first/last."""
    from ciws_server_spark.plans.influxql import query_measurement

    q = (
        "SELECT mean(hotOutFlowRate), count(hotOutFlowRate), "
        "first(coldInFlowRate), last(coldInFlowRate) "
        "FROM flow GROUP BY time(1h), buildingID"
    )
    got = query_measurement(spark, {"flow": flow}, q)
    rows = got.collect()
    assert len(rows) == 4  # 2 hours × 2 buildings
    r = next(
        x
        for x in rows
        if x["buildingID"] == "A"
        and str(x["time_bucket"]) == "2021-03-01 00:00:00"
    )
    assert r["count_hotOutFlowRate"] == 60
    assert r["first_coldInFlowRate"] == 0.0
    assert r["last_coldInFlowRate"] == 59.0
    # cross-check mean against a direct DataFrame aggregation
    exp = (
        flow.where(
            (F.col("buildingID") == "A")
            & (F.col("time") < F.lit("2021-03-01 01:00:00").cast("timestamp"))
        )
        .agg(F.avg("hotOutFlowRate"))
        .collect()[0][0]
    )
    assert abs(r["mean_hotOutFlowRate"] - exp) < 1e-12


def test_limit_and_errors(spark, flow):
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    got = query_measurement(
        spark, {"flow": flow}, "SELECT hotOutFlowRate FROM flow LIMIT 5"
    )
    assert got.count() == 5

    with pytest.raises(InfluxQLError, match="unknown measurement"):
        query_measurement(spark, {"flow": flow}, "SELECT x FROM nope")
    with pytest.raises(InfluxQLError, match="unsupported condition"):
        query_measurement(
            spark, {"flow": flow},
            "SELECT hotOutFlowRate FROM flow WHERE buildingID =~ /A/",
        )
    with pytest.raises(InfluxQLError, match="unparseable"):
        query_measurement(spark, {"flow": flow}, "SHOW MEASUREMENTS")
