"""CREATE / DROP DATABASE — the reference's deployment guide opens
with ``CREATE DATABASE ciwsdb`` (doc/deployment_guide.md:25), so the
statement is the first thing a migrating user types.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from ciws_server_spark.plans.influxql import InfluxQLError, run_influxql
from ciws_server_spark.sources import sinks


def _mk_table(spark, table_dir):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 6), "A", 1.0)],
        "time timestamp, buildingID string, flowRate double",
    )
    sinks.append_points(df, table_dir, "campus_flow")


def test_create_database_registers_name(spark, tmp_path):
    td = str(tmp_path)
    assert (
        run_influxql(spark, {}, "CREATE DATABASE ciwsdb", table_dir=td)
        == "ciwsdb"
    )
    rows = run_influxql(spark, {}, "SHOW DATABASES", table_dir=td).collect()
    assert [r["name"] for r in rows] == ["ciwsdb"]
    # idempotent re-create; different name refused (one dir = one db)
    run_influxql(spark, {}, "CREATE DATABASE ciwsdb", table_dir=td)
    with pytest.raises(InfluxQLError, match="one table_dir"):
        run_influxql(spark, {}, "CREATE DATABASE other", table_dir=td)
    # ON <registered name> now passes the database check
    rows = run_influxql(
        spark, {}, "SHOW RETENTION POLICIES ON ciwsdb", table_dir=td
    ).collect()
    assert rows[0]["name"] == "autogen"


def test_drop_database_removes_everything(spark, tmp_path):
    td = str(tmp_path)
    _mk_table(spark, td)
    run_influxql(spark, {}, "CREATE DATABASE ciwsdb", table_dir=td)
    run_influxql(
        spark, {},
        "CREATE RETENTION POLICY keep7 ON ciwsdb DURATION 7d "
        "REPLICATION 1 DEFAULT",
        table_dir=td,
    )
    assert run_influxql(
        spark, {}, "DROP DATABASE nope", table_dir=td
    ) is False
    assert run_influxql(
        spark, {}, "DROP DATABASE ciwsdb", table_dir=td
    ) is True
    assert not os.path.lexists(os.path.join(td, "campus_flow"))
    assert not os.path.exists(os.path.join(td, "_retention_policies.json"))
    # back to the unregistered default
    rows = run_influxql(spark, {}, "SHOW DATABASES", table_dir=td).collect()
    assert [r["name"] for r in rows] == ["ciws"]


def test_qualified_into_target(spark, tmp_path):
    """INTO "db"."rp"."measurement" — the form InfluxDB clients emit —
    resolves to the bare measurement, with qualifiers validated."""
    td = str(tmp_path)
    _mk_table(spark, td)
    run_influxql(spark, {}, "CREATE DATABASE ciwsdb", table_dir=td)
    tables = sinks.load_tables(spark, td)
    out = run_influxql(
        spark, tables,
        'SELECT mean(flowRate) INTO "ciwsdb"."autogen"."hourly" '
        "FROM campus_flow GROUP BY time(1h)",
        table_dir=td,
    )
    assert out.count() == 1
    assert os.path.isdir(os.path.join(td, "hourly"))
    with pytest.raises(InfluxQLError, match="unknown database"):
        run_influxql(
            spark, tables,
            'SELECT mean(flowRate) INTO "other"."autogen"."h2" '
            "FROM campus_flow GROUP BY time(1h)",
            table_dir=td,
        )
    with pytest.raises(InfluxQLError, match="unknown retention policy"):
        run_influxql(
            spark, tables,
            'SELECT mean(flowRate) INTO "nope"."h2" '
            "FROM campus_flow GROUP BY time(1h)",
            table_dir=td,
        )


def test_now_relative_time_predicates(spark, tmp_path):
    """WHERE time > now() - 1d — the canonical dashboard predicate —
    with the deterministic now= injection."""
    td = str(tmp_path)
    _mk_table(spark, td)
    more = spark.createDataFrame(
        [(dt.datetime(2024, 1, 10, 6), "A", 9.0)],
        "time timestamp, buildingID string, flowRate double",
    )
    sinks.append_points(more, td, "campus_flow")
    tables = sinks.load_tables(spark, td)
    got = run_influxql(
        spark, tables,
        "SELECT flowRate FROM campus_flow WHERE time > now() - 1d",
        now=dt.datetime(2024, 1, 10, 12),
    )
    assert got.count() == 1  # only the Jan 10 point is inside 24h
    got = run_influxql(
        spark, tables,
        "SELECT count(flowRate) FROM campus_flow WHERE time <= now()",
        now=dt.datetime(2024, 1, 10, 12),
    )
    assert got.collect()[0][0] == 2
    # a tag value containing the text now() is never rewritten
    got = run_influxql(
        spark, tables,
        "SELECT flowRate FROM campus_flow WHERE buildingID = 'now() - 1d'",
        now=dt.datetime(2024, 1, 10, 12),
    )
    assert got.count() == 0
    with pytest.raises(InfluxQLError, match="pass now="):
        run_influxql(
            spark, tables,
            "SELECT flowRate FROM campus_flow WHERE time > now() - 1h",
        )
    # DELETE with a relative horizon
    n = run_influxql(
        spark, tables,
        "DELETE FROM campus_flow WHERE time < now() - 5d",
        table_dir=td, now=dt.datetime(2024, 1, 10, 12),
    )
    assert n == 1  # the Jan 1 point


def test_epoch_integer_time_literals(spark, tmp_path):
    """time >= <epoch ns int> — the raw HTTP API's default literal
    form (bare integers are nanoseconds; s/ms/u suffixes accepted)."""
    td = str(tmp_path)
    _mk_table(spark, td)  # one point at 2024-01-01 06:00
    tables = sinks.load_tables(spark, td)
    ns = int(dt.datetime(2024, 1, 1, 5).timestamp() -
             dt.datetime(1970, 1, 1).timestamp() +
             3600) * 10**9  # naive-UTC epoch of 2024-01-01 06:00
    ns = int((dt.datetime(2024, 1, 1, 6) -
              dt.datetime(1970, 1, 1)).total_seconds()) * 10**9
    q = "SELECT flowRate FROM campus_flow WHERE time >= {}"
    assert run_influxql(spark, tables, q.format(ns)).count() == 1
    assert run_influxql(spark, tables, q.format(ns + 10**9)).count() == 0
    secs = ns // 10**9
    assert run_influxql(spark, tables, q.format(f"{secs}s")).count() == 1
    assert run_influxql(
        spark, tables, q.format(f"{secs * 1000}ms")
    ).count() == 1
    # integer-exact conversion: modern ns literals exceed float64's
    # 2^53 range — this one converts to point-time+1µs through the
    # old int(v/1e9*1e6) float path (excluding the point) but
    # truncates to exactly point time through v//1000
    assert run_influxql(spark, tables, q.format(ns + 896)).count() == 1


def test_regex_from_unions_matching_measurements(spark, tmp_path):
    """FROM /pattern/ evaluates against every matching measurement,
    each result row carrying its measurement name (the JSON 'name'
    field's columnar equivalent); missing fields null-fill."""
    td = str(tmp_path)
    _mk_table(spark, td)  # campus_flow: one point, building A
    other = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 7), "B", 2.0, 40.0)],
        "time timestamp, buildingID string, flowRate double, tempC double",
    )
    sinks.append_points(other, td, "campus_flow_hourly")
    tables = sinks.load_tables(spark, td)
    got = run_influxql(
        spark, tables,
        "SELECT count(flowRate) FROM /^campus_/ GROUP BY time(1d)",
    ).collect()
    by_m = {r["measurement"]: r["count_flowRate"] for r in got}
    assert by_m == {"campus_flow": 1, "campus_flow_hourly": 1}
    # raw select: tempC null-fills for the measurement lacking it
    rows = run_influxql(
        spark, tables, 'SELECT flowRate, tempC FROM /flow/'
    ).collect()
    assert {(r["measurement"], r["tempC"]) for r in rows} == {
        ("campus_flow", None), ("campus_flow_hourly", 40.0)
    }
    with pytest.raises(InfluxQLError, match="no measurement matches"):
        run_influxql(spark, tables, "SELECT flowRate FROM /nope/")


def test_drop_series(spark, tmp_path):
    """DROP SERIES FROM m WHERE tag='v': every point of the series
    goes; time predicates are DELETE's job (named error)."""
    td = str(tmp_path)
    rows = [
        (dt.datetime(2024, 1, d, 6), b, float(d))
        for d in (1, 2) for b in ("A", "B")
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, buildingID string, flowRate double"
    )
    sinks.append_points(df, td, "campus_flow")
    tables = sinks.load_tables(spark, td)
    n = run_influxql(
        spark, tables,
        "DROP SERIES FROM campus_flow WHERE buildingID = 'A'",
        table_dir=td,
    )
    assert n == 2
    left = sinks.read_table(spark, td, "campus_flow")
    assert {r["buildingID"] for r in left.collect()} == {"B"}
    with pytest.raises(InfluxQLError, match="tag predicates only"):
        run_influxql(
            spark, tables,
            "DROP SERIES FROM campus_flow WHERE time < '2024-01-02'",
            table_dir=td,
        )


def test_from_comma_list_and_series_cardinality(spark, tmp_path):
    td = str(tmp_path)
    _mk_table(spark, td)
    other = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 7), "B", 2.0)],
        "time timestamp, buildingID string, flowRate double",
    )
    sinks.append_points(other, td, "campus_flow_hourly")
    tables = sinks.load_tables(spark, td)
    got = run_influxql(
        spark, tables,
        "SELECT count(flowRate) FROM campus_flow, campus_flow_hourly "
        "GROUP BY time(1d)",
    ).collect()
    assert {r["measurement"]: r["count_flowRate"] for r in got} == {
        "campus_flow": 1, "campus_flow_hourly": 1
    }
    with pytest.raises(InfluxQLError, match="unknown measurement"):
        run_influxql(
            spark, tables, "SELECT flowRate FROM campus_flow, nope"
        )
    card = run_influxql(
        spark, tables, "SHOW SERIES CARDINALITY"
    ).collect()
    assert card == [type(card[0])(count=2)] or card[0]["count"] == 2
