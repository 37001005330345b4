"""Campus CSV ingest: superset schema replaces the 2-schema fallback
(FIXTURES.md F2; reference transfer_manager.py:84-121)."""

from __future__ import annotations

import os

import pytest

CURRENT = """Campus Meter Logger
Date,coldInFlowRate,hotInFlowRate,hotOutFlowRate,hotInTemp,hotOutTemp,coldInTemp
2021-03-01 00:00:01,0.53,0.20,0.18,48.9,41.2,12.7
2021-03-01 00:00:02,0.51,0.21,0.00,48.8,41.1,12.6
"""

LEGACY = """Campus Meter Logger
Date,coldInFlowRate,hotInFlowRate,hotOutFlowRate
2021-03-01 00:00:01,0.53,0.20,0.18
"""

BAD = """Campus Meter Logger
Date,coldInFlowRate,hotInFlowRate,hotOutFlowRate
2021-03-01 00:00:01,zero,0.20,0.18
"""


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "campus"
    d.mkdir()
    (d / "current.csv").write_text(CURRENT)
    (d / "legacy.csv").write_text(LEGACY)
    (d / "bad.csv").write_text(BAD)
    return d


def test_superset_schema(spark, landing):
    from ciws_server_spark.sources import campus

    points, manifest = campus.parse(spark, str(landing), building="d")
    m = {os.path.basename(r["src_file"]): r for r in manifest.collect()}
    assert m["current.csv"]["schema_generation"] == "current"
    assert m["current.csv"]["quarantine_reason"] is None
    assert m["legacy.csv"]["schema_generation"] == "legacy"
    assert m["legacy.csv"]["quarantine_reason"] is None
    assert m["bad.csv"]["quarantine_reason"] == "malformed data rows"

    rows = {
        (os.path.basename(r["src_file"]), str(r["time"])): r
        for r in points.collect()
    }
    assert len(rows) == 3  # 2 current + 1 legacy
    cur = rows[("current.csv", "2021-03-01 00:00:01")]
    assert cur["hotInTemp"] == 48.9 and cur["buildingID"] == "D"
    leg = rows[("legacy.csv", "2021-03-01 00:00:01")]
    assert leg["hotInTemp"] is None  # legacy rows: superset nulls
    assert leg["coldInFlowRate"] == 0.53


def test_campus_append(spark, landing, tmp_path):
    from ciws_server_spark.sources import campus, sinks

    table_dir = str(tmp_path / "tables")
    points, _ = campus.parse(spark, str(landing), building="d")
    sinks.append_points(points.drop("src_file"), table_dir, "campus_flow")
    flow = spark.read.parquet(os.path.join(table_dir, "campus_flow"))
    assert flow.count() == 3
    assert set(flow.columns) >= {"time", "buildingID", "hotOutFlowRate", "date"}
