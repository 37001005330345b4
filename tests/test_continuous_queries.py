"""Continuous queries: the CREATE/SHOW/DROP statement surface plus the
scheduler tick (run_due_continuous_queries).

Semantics under test (InfluxDB 1.x CQ contract):
* a CQ only runs forward from creation — history is the batch INTO's
  job;
* a tick executes every bucket that CLOSED since the last run, as ONE
  INTO over the combined range (catch-up after downtime is one query);
* a tick before the next boundary is a no-op;
* state survives process boundaries (it's a file, re-read per call).
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from pyspark.sql import functions as F

from ciws_server_spark.plans.continuous import (
    run_due_continuous_queries,
)
from ciws_server_spark.plans.influxql import InfluxQLError, run_influxql
from ciws_server_spark.sources import sinks


def _mk_table(spark, table_dir, hours=6):
    # CQ statements validate ON <db> against the registered database
    run_influxql(spark, {}, "CREATE DATABASE water", table_dir=table_dir)
    rows = [
        (dt.datetime(2024, 1, 1, h, m), "A", float(h * 100 + m))
        for h in range(hours)
        for m in (0, 30)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, buildingID string, flowRate double"
    )
    sinks.append_points(df, table_dir, "campus_flow")
    return {
        "campus_flow": spark.read.parquet(
            os.path.join(table_dir, "campus_flow")
        )
    }


CREATE = (
    'CREATE CONTINUOUS QUERY cq_hourly ON water BEGIN '
    "SELECT mean(flowRate) INTO hourly FROM campus_flow "
    "GROUP BY time(1h) END"
)


def test_create_show_drop(spark, tmp_path):
    table_dir = str(tmp_path)
    tables = _mk_table(spark, table_dir)
    name = run_influxql(
        spark, tables, CREATE, table_dir=table_dir,
        now=dt.datetime(2024, 1, 1, 0, 0),
    )
    assert name == "cq_hourly"
    shown = run_influxql(
        spark, tables, "SHOW CONTINUOUS QUERIES", table_dir=table_dir
    ).collect()
    assert [r["name"] for r in shown] == ["cq_hourly"]
    assert "INTO hourly" in shown[0]["query"]
    # duplicate names are an error, not a silent replace
    with pytest.raises(InfluxQLError, match="already exists"):
        run_influxql(
            spark, tables, CREATE, table_dir=table_dir,
            now=dt.datetime(2024, 1, 1),
        )
    assert run_influxql(
        spark, tables, "DROP CONTINUOUS QUERY cq_hourly ON water",
        table_dir=table_dir,
    ) is True
    assert run_influxql(
        spark, tables, "DROP CONTINUOUS QUERY cq_hourly",
        table_dir=table_dir,
    ) is False


def test_tick_runs_closed_buckets_once(spark, tmp_path):
    table_dir = str(tmp_path)
    tables = _mk_table(spark, table_dir)
    run_influxql(
        spark, tables, CREATE, table_dir=table_dir,
        now=dt.datetime(2024, 1, 1, 0, 0),
    )
    # before the first boundary closes: no-op
    assert run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 0, 59)
    ) == {}
    # 02:10 → buckets 00:00-01:00 and 01:00-02:00 closed, one execution
    ran = run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 2, 10)
    )
    assert ran["cq_hourly"]["buckets"] == 2
    target = os.path.join(table_dir, "hourly")
    out = spark.read.parquet(target)
    assert out.count() == 2
    got = {r["time"]: r["mean_flowRate"] for r in out.collect()}
    assert got[dt.datetime(2024, 1, 1, 0, 0)] == pytest.approx(15.0)
    assert got[dt.datetime(2024, 1, 1, 1, 0)] == pytest.approx(115.0)
    # same tick again: nothing due, no duplicate rows
    assert run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 2, 10)
    ) == {}
    assert spark.read.parquet(target).count() == 2
    # catch-up after "downtime": hours 2-5 arrive as one execution
    ran = run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 6, 0)
    )
    assert ran["cq_hourly"]["buckets"] == 4
    assert spark.read.parquet(target).count() == 6


def test_cq_respects_existing_where(spark, tmp_path):
    table_dir = str(tmp_path)
    tables = _mk_table(spark, table_dir)
    run_influxql(
        spark, tables,
        "CREATE CONTINUOUS QUERY cq_a BEGIN "
        "SELECT sum(flowRate) INTO a_sum FROM campus_flow "
        "WHERE buildingID = 'A' GROUP BY time(2h) END",
        table_dir=table_dir, now=dt.datetime(2024, 1, 1, 0, 0),
    )
    run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 4, 0)
    )
    out = spark.read.parquet(os.path.join(table_dir, "a_sum"))
    # buckets 00:00 (hours 0+1) and 02:00 (hours 2+3), building A only
    got = {r["time"]: r["sum_flowRate"] for r in out.collect()}
    assert got[dt.datetime(2024, 1, 1, 0, 0)] == pytest.approx(
        0 + 30 + 100 + 130
    )
    assert got[dt.datetime(2024, 1, 1, 2, 0)] == pytest.approx(
        200 + 230 + 300 + 330
    )


def test_state_survives_process_boundary(spark, tmp_path):
    """The catalog is a file: a fresh reader (new dict, as a restarted
    server would build) sees the same schedule position."""
    table_dir = str(tmp_path)
    tables = _mk_table(spark, table_dir)
    run_influxql(
        spark, tables, CREATE, table_dir=table_dir,
        now=dt.datetime(2024, 1, 1, 0, 0),
    )
    run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 3, 0)
    )
    raw = json.load(open(os.path.join(table_dir, "_continuous_queries.json")))
    assert raw["cq_hourly"]["last_end"] == "2024-01-01 03:00:00"
    # "restart": nothing re-runs for the same now
    assert run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 3, 30)
    ) == {}


def test_resample_for_upserts_late_data(spark, tmp_path):
    """RESAMPLE FOR f recomputes the trailing window as an upsert:
    late-arriving source points change the already-written rollup rows
    instead of duplicating them (InfluxDB 1.x resample semantics on an
    append-only store, via the snapshot-protocol DELETE)."""
    table_dir = str(tmp_path)
    tables = _mk_table(spark, table_dir)
    run_influxql(
        spark, tables,
        "CREATE CONTINUOUS QUERY cq_rs ON water RESAMPLE EVERY 1h FOR 2h "
        "BEGIN SELECT mean(flowRate) INTO hourly_rs FROM campus_flow "
        "GROUP BY time(1h) END",
        table_dir=table_dir, now=dt.datetime(2024, 1, 1, 0, 0),
    )
    ran = run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 2, 0)
    )
    assert ran["cq_rs"]["mode"] == "resample"
    assert ran["cq_rs"]["buckets"] == 2
    target = os.path.join(table_dir, "hourly_rs")
    first = {
        r["time"]: r["mean_flowRate"]
        for r in spark.read.parquet(target).collect()
    }
    assert first[dt.datetime(2024, 1, 1, 1, 0)] == pytest.approx(115.0)
    # a late point lands in hour 1 AFTER its bucket was rolled up
    late = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 1, 45), "A", 1000.0)],
        "time timestamp, buildingID string, flowRate double",
    )
    sinks.append_points(late, table_dir, "campus_flow")
    tables["campus_flow"] = spark.read.parquet(
        os.path.join(table_dir, "campus_flow")
    )
    ran = run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 3, 0)
    )
    assert ran["cq_rs"]["buckets"] == 2  # [01:00, 03:00) recomputed
    out = spark.read.parquet(target)
    got = {r["time"]: r["mean_flowRate"] for r in out.collect()}
    assert len(got) == out.count() == 3  # upsert: no duplicate buckets
    assert got[dt.datetime(2024, 1, 1, 1, 0)] == pytest.approx(
        (100 + 130 + 1000) / 3
    )
    assert got[dt.datetime(2024, 1, 1, 0, 0)] == pytest.approx(15.0)


def test_resample_every_changes_cadence(spark, tmp_path):
    """EVERY 2h with a 1h GROUP BY: no execution at the 1h boundary,
    both closed buckets arrive at the 2h boundary."""
    table_dir = str(tmp_path)
    tables = _mk_table(spark, table_dir)
    run_influxql(
        spark, tables,
        "CREATE CONTINUOUS QUERY cq_e RESAMPLE EVERY 2h BEGIN "
        "SELECT mean(flowRate) INTO hourly_e FROM campus_flow "
        "GROUP BY time(1h) END",
        table_dir=table_dir, now=dt.datetime(2024, 1, 1, 0, 0),
    )
    assert run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 1, 30)
    ) == {}  # 1h bucket closed, but the 2h cadence hasn't ticked
    ran = run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 2, 0)
    )
    assert ran["cq_e"]["buckets"] == 2 and ran["cq_e"]["mode"] == "append"


def test_resample_for_must_cover_interval(spark, tmp_path):
    with pytest.raises(InfluxQLError, match="FOR must cover"):
        run_influxql(
            spark, {},
            "CREATE CONTINUOUS QUERY cq_bad RESAMPLE FOR 30m BEGIN "
            "SELECT mean(flowRate) INTO x FROM campus_flow "
            "GROUP BY time(1h) END",
            table_dir=str(tmp_path), now=dt.datetime(2024, 1, 1),
        )


def test_crash_between_write_and_state_replays_one_window(
    spark, tmp_path, monkeypatch
):
    """The documented at-least-once window: a crash AFTER the INTO
    write but BEFORE the state advance re-runs exactly the same range
    on the next tick (duplicate rows in the append-only target, never
    a skipped bucket)."""
    from ciws_server_spark.plans import continuous

    table_dir = str(tmp_path)
    tables = _mk_table(spark, table_dir)
    run_influxql(
        spark, tables, CREATE, table_dir=table_dir,
        now=dt.datetime(2024, 1, 1, 0, 0),
    )
    real_store = continuous._store

    def crash_store(td, state):
        raise RuntimeError("crash before state advance")

    monkeypatch.setattr(continuous, "_store", crash_store)
    with pytest.raises(RuntimeError):
        run_due_continuous_queries(
            spark, tables, table_dir, dt.datetime(2024, 1, 1, 2, 0)
        )
    target = os.path.join(table_dir, "hourly")
    assert spark.read.parquet(target).count() == 2  # write landed
    monkeypatch.setattr(continuous, "_store", real_store)
    ran = run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 2, 0)
    )
    assert ran["cq_hourly"]["buckets"] == 2  # same window replays
    out = spark.read.parquet(target)
    assert out.count() == 4  # duplicated, not skipped
    # a latest-wins consumer reads identical values per bucket
    assert out.select("time", "mean_flowRate").distinct().count() == 2


def test_concurrent_scheduler_tick_skips(spark, tmp_path):
    """Two schedulers racing would both read the same last_end and
    double-append every due window; the second tick must skip while
    the first holds the schedule lock."""
    table_dir = str(tmp_path)
    tables = _mk_table(spark, table_dir)
    run_influxql(
        spark, tables, CREATE, table_dir=table_dir,
        now=dt.datetime(2024, 1, 1, 0, 0),
    )
    lock_path = os.path.join(
        table_dir, "_continuous_queries.json.lock"
    )
    holder = sinks._flock(lock_path, exclusive=True, blocking=False)
    holder.__enter__()
    try:
        assert run_due_continuous_queries(
            spark, tables, table_dir, dt.datetime(2024, 1, 1, 2, 0)
        ) == {}  # skipped, not executed twice
    finally:
        holder.__exit__(None, None, None)
    ran = run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2024, 1, 1, 2, 0)
    )
    assert ran["cq_hourly"]["buckets"] == 2  # runs once the lock frees
    assert spark.read.parquet(
        os.path.join(table_dir, "hourly")
    ).count() == 2


def test_calendar_cq_named_error(spark, tmp_path):
    tables = {}
    with pytest.raises(InfluxQLError, match="calendar-unit"):
        run_influxql(
            spark, tables,
            "CREATE CONTINUOUS QUERY cq_mo BEGIN "
            "SELECT mean(flowRate) INTO monthly FROM campus_flow "
            "GROUP BY time(1mo) END",
            table_dir=str(tmp_path), now=dt.datetime(2024, 1, 1),
        )
    with pytest.raises(InfluxQLError, match="INTO"):
        run_influxql(
            spark, tables,
            "CREATE CONTINUOUS QUERY cq_x BEGIN "
            "SELECT mean(flowRate) FROM campus_flow GROUP BY time(1h) END",
            table_dir=str(tmp_path), now=dt.datetime(2024, 1, 1),
        )


def test_tz_cq_windows_on_local_grid(spark, tmp_path):
    """A tz('Zone') CQ floors its data windows on the LOCAL wall-clock
    grid (r11): at 03:00 UTC the Chicago local day is still OPEN —
    the epoch-grid floor would have appended a 19-hours-early partial
    bucket that append-mode never revisits (permanent undercount).
    Boundaries ride the spring-forward transition (3/14 local = 23h)."""
    table_dir = str(tmp_path)
    run_influxql(spark, {}, "CREATE DATABASE water", table_dir=table_dir)
    rows = [
        (dt.datetime(2021, 3, 13, 0, 0) + dt.timedelta(hours=h), "A", 1.0)
        for h in range(72)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, buildingID string, v double"
    )
    sinks.append_points(df, table_dir, "m")
    tables = {"m": spark.read.parquet(os.path.join(table_dir, "m"))}
    run_influxql(
        spark, tables,
        "CREATE CONTINUOUS QUERY cq_local ON water BEGIN "
        "SELECT count(v) INTO rollup FROM m "
        "GROUP BY time(1d) tz('America/Chicago') END",
        table_dir=table_dir,
        now=dt.datetime(2021, 3, 13, 12, 0),  # local day 3/13 open
    )
    # 03:00Z on 3/15 = 22:00 local 3/14: local day 3/14 still OPEN —
    # only local day 3/13 (24 points at 06:00Z) may emit
    ran = run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2021, 3, 15, 3, 0)
    )
    assert ran["cq_local"]["buckets"] == 1
    target = os.path.join(table_dir, "rollup")
    got = {
        str(r["time"]): r["count_v"]
        for r in spark.read.parquet(target).collect()
    }
    assert got == {"2021-03-13 06:00:00": 24.0}
    # next UTC-cadence tick: local day 3/14 closed (23h, spring-fwd);
    # local day 3/15 is still open (it closes at 05:00Z on 3/16)
    ran = run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2021, 3, 16, 1, 0)
    )
    assert ran["cq_local"]["buckets"] == 1
    got = {
        str(r["time"]): r["count_v"]
        for r in spark.read.parquet(target).collect()
    }
    assert got == {
        "2021-03-13 06:00:00": 24.0,
        "2021-03-14 06:00:00": 23.0,
    }
    # one more cadence: local day 3/15 closes (data ends 3/15 23:00Z)
    ran = run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2021, 3, 17, 1, 0)
    )
    assert ran["cq_local"]["buckets"] == 1
    got = {
        str(r["time"]): r["count_v"]
        for r in spark.read.parquet(target).collect()
    }
    assert got == {
        "2021-03-13 06:00:00": 24.0,
        "2021-03-14 06:00:00": 23.0,
        "2021-03-15 05:00:00": 19.0,
    }


def test_tz_cq_resample_for_deletes_utc_window(spark, tmp_path):
    """RESAMPLE FOR on a tz CQ: the recompute window is computed on
    the wall grid but the TARGET delete happens on the UTC instants
    the rollup actually stores — late points upsert, no duplicates."""
    table_dir = str(tmp_path)
    run_influxql(spark, {}, "CREATE DATABASE water", table_dir=table_dir)
    rows = [
        (dt.datetime(2021, 3, 13, 0, 0) + dt.timedelta(hours=h), "A", 1.0)
        for h in range(48)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, buildingID string, v double"
    )
    sinks.append_points(df, table_dir, "m")
    tables = {"m": spark.read.parquet(os.path.join(table_dir, "m"))}
    run_influxql(
        spark, tables,
        "CREATE CONTINUOUS QUERY cq_for ON water BEGIN "
        "SELECT count(v) INTO rollup FROM m "
        "GROUP BY time(1d) tz('America/Chicago') END",
        table_dir=table_dir,
        now=dt.datetime(2021, 3, 13, 12, 0),
    )
    # hand the record a FOR window so every tick recomputes 2 local days
    from ciws_server_spark.plans import continuous as C

    state = json.load(open(C._state_path(table_dir)))
    state["cq_for"]["for_s"] = 2 * 86400
    json.dump(state, open(C._state_path(table_dir), "w"))

    run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2021, 3, 15, 3, 0)
    )
    # late data for local day 3/13 arrives; the next FOR tick must
    # REPLACE the 3/13 row (upsert via UTC-windowed delete), not stack
    late = spark.createDataFrame(
        [(dt.datetime(2021, 3, 13, 7, 30), "A", 1.0)],
        "time timestamp, buildingID string, v double",
    )
    sinks.append_points(late, table_dir, "m")
    tables = {"m": spark.read.parquet(os.path.join(table_dir, "m"))}
    run_due_continuous_queries(
        spark, tables, table_dir, dt.datetime(2021, 3, 16, 1, 0)
    )
    out = spark.read.parquet(os.path.join(table_dir, "rollup"))
    rows_313 = out.where(
        F.col("time") == dt.datetime(2021, 3, 13, 6, 0)
    ).collect()
    assert len(rows_313) == 1  # replaced, not duplicated
    assert rows_313[0]["count_v"] == 25.0  # 24 + the late point


def test_cq_with_math_select(spark, tmp_path):
    """A CQ body may use point-wise math over its aggregate — the
    grammar additions compose through the scheduler."""
    import datetime as dt

    from ciws_server_spark.plans.continuous import (
        run_due_continuous_queries,
    )
    from ciws_server_spark.plans.influxql import run_influxql
    from ciws_server_spark.sources import sinks

    td = str(tmp_path)
    rows = [
        (dt.datetime(2024, 1, 1, h), "A", float(h) + 0.3)
        for h in range(8)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, buildingID string, flowRate double"
    )
    sinks.append_points(df, td, "campus_flow")
    run_influxql(
        spark, {},
        "CREATE CONTINUOUS QUERY cm ON ciws BEGIN "
        "SELECT round(mean(flowRate)) AS r INTO cq_math "
        "FROM campus_flow GROUP BY time(1h) END",
        table_dir=td, now=dt.datetime(2024, 1, 1, 6),
    )
    run_due_continuous_queries(
        spark, sinks.load_tables(spark, td), td,
        dt.datetime(2024, 1, 1, 8),
    )
    got = sinks.read_table(spark, td, "cq_math").orderBy("time").collect()
    assert [(r["time"].hour, r["r"]) for r in got] == [
        (6, 6.0), (7, 7.0),
    ]
