"""Retention policies: registry statements + the enforcement tick
(store-enforced retention, closing the 'explicit job only' caveat the
SHOW stub used to document).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from ciws_server_spark.plans.influxql import InfluxQLError, run_influxql
from ciws_server_spark.plans.retention import enforce_retention
from ciws_server_spark.sources import sinks


def _mk_table(spark, table_dir, days=5):
    rows = [
        (dt.datetime(2024, 1, d, 6), "A", float(d)) for d in range(1, days + 1)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, buildingID string, flowRate double"
    )
    sinks.append_points(df, table_dir, "campus_flow")


def test_policy_statements_roundtrip(spark, tmp_path):
    td = str(tmp_path)
    # seed state: the autogen default, infinite
    rows = run_influxql(
        spark, {}, "SHOW RETENTION POLICIES", table_dir=td
    ).collect()
    assert [(r["name"], r["duration"], r["default"]) for r in rows] == [
        ("autogen", "0s", True)
    ]
    assert (
        run_influxql(
            spark, {},
            'CREATE RETENTION POLICY "three_days" ON ciws DURATION 3d '
            "REPLICATION 1 DEFAULT",
            table_dir=td,
        )
        == "three_days"
    )
    rows = {
        r["name"]: (r["duration"], r["default"])
        for r in run_influxql(
            spark, {}, "SHOW RETENTION POLICIES ON ciws", table_dir=td
        ).collect()
    }
    assert rows["three_days"] == ("72h0m0s", True)
    assert rows["autogen"] == ("0s", False)  # default moved
    run_influxql(
        spark, {},
        "ALTER RETENTION POLICY three_days ON ciws DURATION 2d",
        table_dir=td,
    )
    rows = {
        r["name"]: r["duration"]
        for r in run_influxql(
            spark, {}, "SHOW RETENTION POLICIES", table_dir=td
        ).collect()
    }
    assert rows["three_days"] == "48h0m0s"
    # default policy cannot be dropped; non-default can
    with pytest.raises(InfluxQLError, match="default"):
        run_influxql(
            spark, {},
            "DROP RETENTION POLICY three_days ON ciws", table_dir=td,
        )
    assert run_influxql(
        spark, {}, "DROP RETENTION POLICY autogen ON ciws", table_dir=td
    ) is True
    with pytest.raises(InfluxQLError, match="unknown database"):
        run_influxql(
            spark, {}, "SHOW RETENTION POLICIES ON other", table_dir=td
        )


def test_enforcement_drops_whole_expired_partitions(spark, tmp_path):
    td = str(tmp_path)
    _mk_table(spark, td, days=5)
    run_influxql(
        spark, {},
        "CREATE RETENTION POLICY keep2 ON ciws DURATION 2d "
        "REPLICATION 1 DEFAULT",
        table_dir=td,
    )
    # now = Jan 5 12:00 → horizon Jan 3; days 1 and 2 drop entirely
    dropped = enforce_retention(
        spark, td, dt.datetime(2024, 1, 5, 12)
    )
    assert dropped == {"campus_flow": 2}
    df = sinks.read_table(spark, td, "campus_flow")
    assert df.count() == 3
    assert df.agg({"time": "min"}).collect()[0][0] == dt.datetime(2024, 1, 3, 6)
    # idempotent tick
    assert enforce_retention(spark, td, dt.datetime(2024, 1, 5, 12)) == {}


def test_infinite_default_is_noop(spark, tmp_path):
    td = str(tmp_path)
    _mk_table(spark, td, days=3)
    # autogen (INF) stays default → nothing drops
    assert enforce_retention(spark, td, dt.datetime(2030, 1, 1)) == {}
    assert sinks.read_table(spark, td, "campus_flow").count() == 3


def test_bad_duration_named_error(spark, tmp_path):
    with pytest.raises(InfluxQLError, match="bad duration"):
        run_influxql(
            spark, {},
            "CREATE RETENTION POLICY x ON ciws DURATION 1mo REPLICATION 1",
            table_dir=str(tmp_path),
        )


def test_alter_duration_and_shard_duration_together(spark, tmp_path):
    """Both clauses in one ALTER, with the SAME token — a naive
    DURATION search would seize the shard clause's token."""
    td = str(tmp_path)
    run_influxql(
        spark, {},
        "CREATE RETENTION POLICY p ON ciws DURATION 30d REPLICATION 1",
        table_dir=td,
    )
    run_influxql(
        spark, {},
        "ALTER RETENTION POLICY p ON ciws DURATION 3d SHARD DURATION 3d",
        table_dir=td,
    )
    rows = {
        r["name"]: (r["duration"], r["shardGroupDuration"])
        for r in run_influxql(
            spark, {}, "SHOW RETENTION POLICIES", table_dir=td
        ).collect()
    }
    assert rows["p"] == ("72h0m0s", "72h0m0s")
    # shard-only alter leaves duration untouched
    run_influxql(
        spark, {},
        "ALTER RETENTION POLICY p ON ciws SHARD DURATION 1d",
        table_dir=td,
    )
    rows = {
        r["name"]: (r["duration"], r["shardGroupDuration"])
        for r in run_influxql(
            spark, {}, "SHOW RETENTION POLICIES", table_dir=td
        ).collect()
    }
    assert rows["p"] == ("72h0m0s", "24h0m0s")
