"""INTO :MEASUREMENT backreference (upstream INTO grammar): the
statement runs once per matched source measurement, writing into the
same-named target; returns per-measurement written counts."""

from __future__ import annotations

import datetime as dt

import pytest

from ciws_server_spark.plans.influxql import InfluxQLError, run_influxql
from ciws_server_spark.sources import sinks


@pytest.fixture()
def store(spark, tmp_path):
    td = str(tmp_path)
    for name, vals in (("campus_a", [1.0, 2.0]), ("campus_b", [3.0])):
        df = spark.createDataFrame(
            [
                (dt.datetime(2024, 1, 1, 6, i), "X", v)
                for i, v in enumerate(vals)
            ],
            "time timestamp, buildingID string, flowRate double",
        )
        sinks.append_points(df, td, name)
    return td


def test_backref_aggregated_rollup_per_measurement(spark, store):
    tabs = sinks.load_tables(spark, store)
    out = run_influxql(
        spark,
        tabs,
        "SELECT mean(flowRate) INTO :MEASUREMENT FROM /^campus_/ "
        "GROUP BY time(1h)",
        table_dir=store,
    )
    rows = {r["measurement"]: r["written"] for r in out.collect()}
    assert rows == {"campus_a": 1, "campus_b": 1}
    # each table gained its own 1-row hourly rollup
    a = sinks.read_table(spark, store, "campus_a")
    assert a.count() == 3  # 2 raw + 1 rollup row
    roll = a.where(a.flowRate.isNull()).collect()
    assert len(roll) == 1 and roll[0]["mean_flowRate"] == 1.5


def test_backref_qualified_and_errors(spark, store):
    tabs = sinks.load_tables(spark, store)
    out = run_influxql(
        spark,
        tabs,
        'SELECT mean(flowRate) INTO ciws."autogen".:MEASUREMENT '
        "FROM campus_b GROUP BY time(1h)",
        table_dir=store,
    )
    assert [tuple(r) for r in out.collect()] == [("campus_b", 1)]
    with pytest.raises(InfluxQLError, match="unknown database"):
        run_influxql(
            spark,
            tabs,
            'SELECT mean(flowRate) INTO otherdb."autogen".:MEASUREMENT '
            "FROM campus_b GROUP BY time(1h)",
            table_dir=store,
        )
    with pytest.raises(InfluxQLError, match="unknown retention policy"):
        run_influxql(
            spark,
            tabs,
            "SELECT mean(flowRate) INTO ciws.norp.:MEASUREMENT "
            "FROM campus_b GROUP BY time(1h)",
            table_dir=store,
        )
    with pytest.raises(InfluxQLError, match="single or /regex/ FROM"):
        run_influxql(
            spark,
            tabs,
            "SELECT mean(flowRate) INTO :MEASUREMENT "
            "FROM campus_a, campus_b GROUP BY time(1h)",
            table_dir=store,
        )


def test_backref_no_match_regex_writes_nothing(spark, store):
    tabs = sinks.load_tables(spark, store)
    out = run_influxql(
        spark,
        tabs,
        "SELECT mean(flowRate) INTO :MEASUREMENT FROM /^nomatch/ "
        "GROUP BY time(1h)",
        table_dir=store,
    )
    assert out.count() == 0
    assert sinks.read_table(spark, store, "campus_a").count() == 2


def test_backref_from_rewrite_uses_matched_span(spark, store):
    """r12 ADVICE: the per-measurement rewrite splices the target
    into the parser's matched FROM span (never a fresh \\S+ regex
    that could leave fragments); a FROM token the grammar cannot
    match (whitespace inside a regex) is a clean named error."""
    tabs = sinks.load_tables(spark, store)
    with pytest.raises(InfluxQLError, match="unparseable|INTO"):
        run_influxql(
            spark, tabs,
            "SELECT mean(flowRate) INTO :MEASUREMENT FROM /a b/ "
            "GROUP BY time(1h)",
            table_dir=store,
        )
    # a WHERE clause after the FROM survives the splice intact
    out = run_influxql(
        spark, tabs,
        "SELECT mean(flowRate) INTO :MEASUREMENT FROM /^campus_/ "
        "WHERE buildingID = 'X' GROUP BY time(1h)",
        table_dir=store,
    )
    rows = {r["measurement"]: r["written"] for r in out.collect()}
    assert rows == {"campus_a": 1, "campus_b": 1}
