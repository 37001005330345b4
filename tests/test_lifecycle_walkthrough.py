"""End-to-end lifecycle: the README 'Using the engine' walkthrough as
one test — ingest, administer (database / retention policy / CQ),
query, mutate, tick, maintain. Every statement routes through the one
dispatcher an HTTP endpoint would call, so this doubles as the
integration test that the documented example actually runs.
"""

from __future__ import annotations

import datetime as dt
import os

from ciws_server_spark.plans.continuous import run_due_continuous_queries
from ciws_server_spark.plans.influxql import run_influxql
from ciws_server_spark.plans.retention import enforce_retention
from ciws_server_spark.sources import sinks


def test_full_lifecycle(spark, tmp_path):
    td = str(tmp_path)

    # 1. ingest: ten days of points, two buildings
    rows = [
        (dt.datetime(2024, 1, d, h), b, float(d * 10 + h))
        for d in range(1, 11)
        for h in (6, 18)
        for b in ("A", "B")
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, buildingID string, flowRate double"
    )
    sinks.append_points(df, td, "campus_flow")

    # 2. administer
    assert run_influxql(spark, {}, "CREATE DATABASE ciwsdb", table_dir=td) \
        == "ciwsdb"
    run_influxql(
        spark, {},
        "CREATE RETENTION POLICY keep7 ON ciwsdb DURATION 7d "
        "REPLICATION 1 DEFAULT",
        table_dir=td,
    )
    tables = sinks.load_tables(spark, td)
    run_influxql(
        spark, tables,
        "CREATE CONTINUOUS QUERY daily ON ciwsdb RESAMPLE FOR 2d BEGIN "
        'SELECT mean(flowRate) INTO "ciwsdb"."keep7"."campus_flow_daily" '
        "FROM campus_flow GROUP BY time(1d) END",
        table_dir=td, now=dt.datetime(2024, 1, 1),
    )

    # 3. query through the dispatcher
    got = run_influxql(
        spark, tables,
        "SELECT mean(flowRate) FROM campus_flow "
        "GROUP BY time(1d), buildingID",
        table_dir=td,
    )
    assert got.count() == 20  # 10 days × 2 buildings

    # 4. mutate: row-level delete
    n = run_influxql(
        spark, tables,
        "DELETE FROM campus_flow WHERE buildingID = 'B' "
        "AND time < '2024-01-02'",
        table_dir=td,
    )
    assert n == 2

    # 5. the cron tick: CQ rollup + policy retention at Jan 11
    now = dt.datetime(2024, 1, 11)
    tables = sinks.load_tables(spark, td)
    ran = run_due_continuous_queries(spark, tables, td, now)
    assert ran["daily"]["mode"] == "resample"
    daily = sinks.read_table(spark, td, "campus_flow_daily")
    # RESAMPLE FOR 2d bounds each execution's reach: one tick at
    # Jan 11 recomputes only [Jan 9, Jan 11) — 2 buckets. History is
    # the batch INTO's job (InfluxDB semantics), so backfill the rest:
    assert daily.count() == 2
    run_influxql(
        spark, tables,
        'SELECT mean(flowRate) INTO "ciwsdb"."keep7"."campus_flow_daily" '
        "FROM campus_flow WHERE time < '2024-01-09' GROUP BY time(1d)",
        table_dir=td,
    )
    daily = sinks.read_table(spark, td, "campus_flow_daily")
    assert daily.count() == 10  # every closed day rolled up
    dropped = enforce_retention(spark, td, now)
    # horizon Jan 4: days 1-3 drop from the raw table — 2 buildings ×
    # 3 days = 6 (building, day) combinations, but step 4's delete
    # already removed B/Jan-1 ENTIRELY (since r11's staged append no
    # hidden .crc debris keeps an emptied partition dir alive — the
    # pre-r11 count of 6 included that zombie dir), so 5 partition
    # directories remain to drop; the unpartitioned rollup table has
    # no date dirs to drop
    assert dropped == {"campus_flow": 5}

    # 6. maintenance: sorted compaction + point dedupe, both snapshots
    sinks.compact_table(spark, td, "campus_flow", sort_by=["time"])
    assert sinks.dedupe_points(spark, td, "campus_flow") == 0
    left = sinks.read_table(spark, td, "campus_flow")
    # days 4-10 × 2 hours × 2 buildings, minus nothing else
    assert left.count() == 7 * 2 * 2
    assert left.agg({"time": "min"}).collect()[0][0] == dt.datetime(
        2024, 1, 4, 6
    )
