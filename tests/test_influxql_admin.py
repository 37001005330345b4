"""Ops/admin plane (plans/admin.py): SHOW SHARDS / SHARD GROUPS /
DROP SHARD over the retention policy's logical shard-group windows,
SHOW QUERIES / KILL QUERY over active streaming queries, SHOW STATS /
DIAGNOSTICS, and the subscription registry."""

from __future__ import annotations

import datetime as dt

import pytest

from ciws_server_spark.plans.influxql import InfluxQLError, run_influxql
from ciws_server_spark.sources import sinks


@pytest.fixture()
def tables(spark):
    # points spanning 3 calendar weeks → 3 autogen (7d) shard groups
    rows = [
        (dt.datetime(2024, 1, 4, 6, 0), "A", 1.0),
        (dt.datetime(2024, 1, 4, 7, 0), "B", 2.0),
        (dt.datetime(2024, 1, 11, 6, 0), "A", 3.0),
        (dt.datetime(2024, 1, 18, 6, 0), "B", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, buildingID string, flowRate double"
    )
    return {"campus_flow": df}


def test_show_shards_windows(spark, tables):
    out = run_influxql(spark, tables, "SHOW SHARDS")
    rows = out.orderBy("id").collect()
    assert out.columns == [
        "id", "database", "retention_policy", "shard_group",
        "start_time", "end_time", "expiry_time", "owners",
    ]
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert {r["retention_policy"] for r in rows} == {"autogen"}
    # 7-day aligned windows, end = start + 7d, infinite RP → no expiry
    for r in rows:
        assert (r["end_time"] - r["start_time"]).days == 7
        assert r["expiry_time"] is None
    # every point falls inside its window
    assert rows[0]["start_time"] <= dt.datetime(2024, 1, 4) < rows[0]["end_time"]


def test_show_shard_groups_projection(spark, tables):
    out = run_influxql(spark, tables, "SHOW SHARD GROUPS")
    assert out.columns == [
        "id", "database", "retention_policy",
        "start_time", "end_time", "expiry_time",
    ]
    assert out.count() == 3


def test_drop_shard_deletes_window(spark, tables, tmp_path):
    table_dir = str(tmp_path)
    sinks.append_points(tables["campus_flow"], table_dir, "campus_flow")
    store = sinks.load_tables(spark, table_dir)
    # shard 1 holds the two Jan-4 points
    n = run_influxql(
        spark, store, "DROP SHARD 1", table_dir=table_dir
    )
    assert n == 2
    left = sinks.read_table(spark, table_dir, "campus_flow")
    times = sorted(r["time"] for r in left.collect())
    assert times == [
        dt.datetime(2024, 1, 11, 6, 0), dt.datetime(2024, 1, 18, 6, 0)
    ]
    with pytest.raises(InfluxQLError, match="shard not found"):
        run_influxql(
            spark,
            sinks.load_tables(spark, table_dir),
            "DROP SHARD 99",
            table_dir=table_dir,
        )


def test_drop_shard_requires_table_dir(spark, tables):
    with pytest.raises(InfluxQLError, match="table_dir"):
        run_influxql(spark, tables, "DROP SHARD 1")


def test_show_queries_and_kill(spark, tables, tmp_path):
    out = run_influxql(spark, tables, "SHOW QUERIES")
    assert out.columns == ["qid", "query", "database", "batches", "status"]
    base = out.count()
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.format("noop")
        .queryName("admin_probe_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        out = run_influxql(spark, tables, "SHOW QUERIES")
        rows = out.collect()
        assert len(rows) == base + 1
        mine = [r for r in rows if r["query"] == "admin_probe_stream"]
        assert mine and mine[0]["status"] == "running"
        run_influxql(spark, tables, f"KILL QUERY {mine[0]['qid']}")
        q.awaitTermination(20)
        assert not q.isActive
    finally:
        if q.isActive:
            q.stop()
    with pytest.raises(InfluxQLError, match="query not found"):
        run_influxql(spark, tables, "KILL QUERY 9999")


def test_show_stats_and_diagnostics(spark, tables, tmp_path):
    table_dir = str(tmp_path)
    sinks.append_points(tables["campus_flow"], table_dir, "campus_flow")
    out = run_influxql(
        spark, tables, "SHOW STATS", table_dir=table_dir
    )
    stats = {(r["module"], r["stat"]): r["value"] for r in out.collect()}
    assert stats[("registry", "measurements")] == 1.0
    assert stats[("store:campus_flow", "numFiles")] >= 1.0
    assert stats[("store:campus_flow", "diskBytes")] > 0.0
    diag = run_influxql(spark, tables, "SHOW DIAGNOSTICS")
    kv = {(r["component"], r["key"]): r["value"] for r in diag.collect()}
    assert kv[("build", "sparkVersion")] == spark.version
    assert ("config", "master") in kv


def test_subscription_lifecycle(spark, tables, tmp_path):
    table_dir = str(tmp_path)
    mk = lambda s: run_influxql(  # noqa: E731
        spark, tables, s, table_dir=table_dir
    )
    assert mk(
        'CREATE SUBSCRIPTION "sub0" ON ciws."autogen" '
        "DESTINATIONS ALL 'http://h1:9090', 'http://h2:9090'"
    ) == "sub0"
    with pytest.raises(InfluxQLError, match="already exists"):
        mk(
            'CREATE SUBSCRIPTION "sub0" ON ciws."autogen" '
            "DESTINATIONS ANY 'http://h3:9090'"
        )
    with pytest.raises(InfluxQLError, match="unknown database"):
        mk(
            'CREATE SUBSCRIPTION "s" ON otherdb."autogen" '
            "DESTINATIONS ALL 'http://h:1'"
        )
    with pytest.raises(InfluxQLError, match="unknown retention policy"):
        mk(
            'CREATE SUBSCRIPTION "s" ON ciws."norp" '
            "DESTINATIONS ALL 'http://h:1'"
        )
    out = mk("SHOW SUBSCRIPTIONS")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "sub0"
    assert rows[0]["mode"] == "ALL"
    assert rows[0]["destinations"] == [
        "http://h1:9090", "http://h2:9090"
    ]
    assert mk('DROP SUBSCRIPTION "sub0" ON ciws."autogen"') is True
    with pytest.raises(InfluxQLError, match="not found"):
        mk('DROP SUBSCRIPTION "sub0" ON ciws."autogen"')
    assert mk("SHOW SUBSCRIPTIONS").count() == 0


def test_subscriptions_require_table_dir(spark, tables):
    for s in [
        'CREATE SUBSCRIPTION "s" ON ciws."autogen" DESTINATIONS ALL \'u\'',
        'DROP SUBSCRIPTION "s" ON ciws."autogen"',
        "SHOW SUBSCRIPTIONS",
    ]:
        with pytest.raises(InfluxQLError, match="table_dir"):
            run_influxql(spark, tables, s)
