"""End-to-end §3.3 lifecycle: campus CSV → campus_flow table →
derived-rate job → derived_hot_intake table, F4 hand-computed values."""

from __future__ import annotations

import os

# F4 pulse pattern: pulses at :00, :59, :03:59; zeros between.
CSV = """Campus Meter Logger
Date,coldInFlowRate,hotInFlowRate,hotOutFlowRate,hotInTemp,hotOutTemp,coldInTemp
2021-03-01 00:00:00,0.5,0.2,5.0,48.9,41.2,12.7
2021-03-01 00:00:30,0.5,0.2,0.0,48.9,41.2,12.7
2021-03-01 00:00:59,0.5,0.2,2.0,48.9,41.2,12.7
2021-03-01 00:02:00,0.5,0.2,0.0,48.9,41.2,12.7
2021-03-01 00:03:59,0.5,0.2,1.0,48.9,41.2,12.7
"""


def test_campus_to_derived(spark, tmp_path):
    from ciws_server_spark.jobs import run_derived_rate_job
    from ciws_server_spark.sources import campus, sinks

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "meter.csv").write_text(CSV)
    table_dir = str(tmp_path / "tables")

    points, _ = campus.parse(spark, str(landing), building="d")
    sinks.append_points(points.drop("src_file"), table_dir, "campus_flow")

    n = run_derived_rate_job(spark, table_dir, building="d")
    assert n == 2

    derived = spark.read.parquet(
        os.path.join(table_dir, "derived_hot_intake")
    ).orderBy("time")
    rows = derived.collect()
    # pulses at t=0,59,239s → rates 60/(59+1)=1.0 and 60/(180+1)
    assert [r["hotOutFlowRate"] for r in rows] == [1.0, round(60.0 / 181, 6)]
    assert {r["buildingID"] for r in rows} == {"D"}
    # partition layout: buildingID + date
    assert os.path.isdir(
        os.path.join(table_dir, "derived_hot_intake", "buildingID=D")
    )

    # time-range restriction (the reference's exercised query shape)
    n2 = run_derived_rate_job(
        spark,
        table_dir,
        building="d",
        start="2021-03-01 00:00:30",
        end="2021-03-01 00:02:30",
    )
    assert n2 == 0  # only one pulse in range → no pair


def test_hourly_rollup_matches_direct_aggregation(spark, tmp_path):
    """Continuous-aggregate table ≡ direct aggregation over raw points."""
    import pyspark.sql.functions as F

    from ciws_server_spark.jobs import build_hourly_rollup
    from ciws_server_spark.sources import campus, sinks

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "meter.csv").write_text(CSV)
    table_dir = str(tmp_path / "tables")
    points, _ = campus.parse(spark, str(landing), building="d")
    sinks.append_points(points.drop("src_file"), table_dir, "campus_flow")

    n = build_hourly_rollup(spark, table_dir)
    assert n == 1  # all fixture rows fall in one building-hour

    rollup = spark.read.parquet(
        os.path.join(table_dir, "campus_flow_hourly")
    ).collect()[0]
    raw = spark.read.parquet(os.path.join(table_dir, "campus_flow"))
    exp = raw.agg(
        F.count(F.lit(1)), F.sum("hotOutFlowRate"), F.max("hotOutFlowRate")
    ).collect()[0]
    assert rollup["n_points"] == exp[0]
    assert rollup["sum_hot_out"] == exp[1]
    assert rollup["max_hot_out"] == exp[2]
    assert str(rollup["time"]) == "2021-03-01 00:00:00"


def test_hourly_rollup_incremental_refresh_is_idempotent(spark, tmp_path):
    """The continuous aggregate refreshes per date partition: a
    re-run of the same date converges (overwrite-by-partition, no
    double counting), and refreshing only the new date leaves the
    old partition untouched."""
    import datetime as dt

    import pyspark.sql.functions as F

    from ciws_server_spark.jobs import build_hourly_rollup
    from ciws_server_spark.sources import sinks

    table_dir = str(tmp_path / "tables")
    base = dt.datetime(2021, 3, 1)

    def land(day, n_rows):
        rows = [
            (
                base.replace(day=day) + dt.timedelta(minutes=i),
                "D", 1.0, 0.5, 45.0,
            )
            for i in range(n_rows)
        ]
        df = spark.createDataFrame(
            rows,
            ["time", "buildingID", "hotOutFlowRate", "hotInFlowRate", "hotInTemp"],
        )
        sinks.append_points(df, table_dir, "campus_flow")

    land(1, 5)
    assert build_hourly_rollup(spark, table_dir) == 1
    # re-run: same single partition, same counts (idempotent)
    assert build_hourly_rollup(spark, table_dir) == 1
    hourly = spark.read.parquet(os.path.join(table_dir, "campus_flow_hourly"))
    assert hourly.count() == 1
    assert hourly.collect()[0]["n_points"] == 5

    # day 2 arrives; refresh ONLY that partition
    land(2, 3)
    assert build_hourly_rollup(spark, table_dir, dates=["2021-03-02"]) == 1
    hourly = spark.read.parquet(os.path.join(table_dir, "campus_flow_hourly"))
    got = {str(r["date"]): r["n_points"] for r in hourly.collect()}
    assert got == {"2021-03-01": 5, "2021-03-02": 3}
