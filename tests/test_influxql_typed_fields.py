"""Type-aware select semantics (upstream InfluxDB parity):

* numeric-only aggregates (mean/sum/spread/stddev/median/percentile)
  over a STRING field see zero numeric points — null aggregate under
  the engine's all-null-group row convention, never an executor
  CAST_INVALID_INPUT / AnalysisException leak;
* numeric-only transforms over a string field produce the empty
  sequence; elapsed is type-agnostic and keeps working;
* mode() works on string fields (most-frequent, ties → smallest);
* count(distinct(f)) / count(DISTINCT f) — upstream's one legal
  aggregate nesting;
* FROM may be qualified (db.rp.m / rp.m / db..m), validated against
  the registered database name.
"""

from __future__ import annotations

import datetime as dt

import pytest

from ciws_server_spark.plans.influxql import InfluxQLError, run_influxql


@pytest.fixture(scope="module")
def tables(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 6, 0), "A", "x", 4.0),
        (dt.datetime(2024, 1, 1, 6, 30), "B", "y", 9.0),
        (dt.datetime(2024, 1, 1, 7, 0), "B", "y", 1.0),
        (dt.datetime(2024, 1, 1, 7, 30), "B", None, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, host string, note string, value double"
    )
    return {"m": df}


def test_numeric_only_aggs_over_string_are_null(spark, tables):
    for fn in ("mean", "sum", "spread", "stddev", "median"):
        out = run_influxql(spark, tables, f"SELECT {fn}(note) FROM m")
        (row,) = out.collect()
        assert row[f"{fn}_note"] is None, fn
    out = run_influxql(
        spark, tables, "SELECT percentile(note, 50) FROM m"
    )
    assert out.collect()[0]["percentile_note"] is None
    # bucketed form keeps the group rows (all-null-field convention)
    out = run_influxql(
        spark, tables, "SELECT sum(note) FROM m GROUP BY time(1h)"
    )
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["sum_note"] is None for r in rows)


def test_string_capable_aggs_still_work(spark, tables):
    out = run_influxql(spark, tables, "SELECT mode(note) FROM m")
    assert out.collect()[0]["mode_note"] == "y"
    out = run_influxql(spark, tables, "SELECT mode(value) FROM m")
    assert out.collect()[0]["mode_value"] == 1.0
    out = run_influxql(spark, tables, "SELECT first(note) FROM m")
    assert out.collect()[0]["first_note"] == "x"
    out = run_influxql(spark, tables, "SELECT count(note) FROM m")
    assert out.collect()[0]["count_note"] == 3


def test_numeric_transforms_over_string_empty(spark, tables):
    for q in (
        "SELECT moving_average(note, 2) FROM m",
        "SELECT cumulative_sum(note) FROM m",
        "SELECT derivative(note) FROM m",
        "SELECT difference(note) FROM m",
    ):
        assert run_influxql(spark, tables, q).count() == 0, q
    # integral is a bare aggregate: zero points → the engine's
    # one-null-row empty-group convention (same as sum() over an
    # empty WHERE range), not an error
    out = run_influxql(spark, tables, "SELECT integral(note) FROM m")
    assert [r["integral"] for r in out.collect()] == [None]
    # elapsed measures time gaps of points that HAVE the field —
    # type-agnostic, and the null note row is not a point of note
    out = run_influxql(spark, tables, "SELECT elapsed(note, 30m) FROM m")
    assert [r["elapsed"] for r in out.collect()] == [1, 1]


def test_count_distinct(spark, tables):
    out = run_influxql(
        spark, tables, "SELECT count(distinct(note)) FROM m"
    )
    assert out.collect()[0]["count_distinct_note"] == 2
    out = run_influxql(
        spark, tables, "SELECT count(DISTINCT value) FROM m"
    )
    assert out.collect()[0]["count_distinct_value"] == 3
    out = run_influxql(
        spark, tables,
        "SELECT count(distinct(value)) FROM m GROUP BY time(1h), host",
    )
    got = {
        (r["time_bucket"].hour, r["host"]): r["count_distinct_value"]
        for r in out.collect()
    }
    assert got == {(6, "A"): 1, (6, "B"): 1, (7, "B"): 1}


def test_qualified_from(spark, tables):
    base = run_influxql(spark, tables, "SELECT mean(value) FROM m")
    want = base.collect()[0]["mean_value"]
    for frm in ("ciws.autogen.m", "autogen.m", '"ciws".."m"',
                '"ciws"."autogen"."m"'):
        out = run_influxql(
            spark, tables, f"SELECT mean(value) FROM {frm}"
        )
        assert out.collect()[0]["mean_value"] == want, frm
    with pytest.raises(InfluxQLError, match="unknown database"):
        run_influxql(
            spark, tables, "SELECT mean(value) FROM otherdb.autogen.m"
        )
    with pytest.raises(InfluxQLError, match="bad FROM"):
        run_influxql(
            spark, tables, "SELECT mean(value) FROM a.b.c.m"
        )
    # a QUOTED name containing dots is one token, not qualifiers
    with pytest.raises(InfluxQLError, match="unknown measurement"):
        run_influxql(spark, tables, 'SELECT mean(value) FROM "a.b.c"')


def test_duplicate_select_items_unique_columns(spark, tables):
    """Exact duplicates collapse; distinct items with colliding
    derived names get _2 ordinals (widened-grammar fuzz find:
    duplicate aggregates leaked COLUMN_ALREADY_EXISTS at the
    multi-measurement union)."""
    out = run_influxql(
        spark, tables, "SELECT stddev(value), stddev(value) FROM m"
    )
    assert out.columns == ["stddev_value"]
    out = run_influxql(
        spark, tables,
        "SELECT percentile(value, 50), percentile(value, 90) FROM m",
    )
    assert out.columns == ["percentile_value", "percentile_value_2"]
    (row,) = out.collect()
    assert row["percentile_value"] <= row["percentile_value_2"]
    out = run_influxql(
        spark, tables,
        "SELECT mean(value) AS x, count(value) AS x FROM m",
    )
    assert out.columns == ["x", "x_2"]
    out = run_influxql(
        spark, tables,
        "SELECT stddev(value), stddev(value) FROM /m/ GROUP BY time(1w)",
    )
    assert out.columns == ["measurement", "time_bucket", "stddev_value"]
    out.collect()  # the union that used to throw


def test_percentile_companion_over_string_is_empty(spark, tables):
    out = run_influxql(
        spark, tables, "SELECT percentile(note, 50), host FROM m"
    )
    assert out.count() == 0
    out = run_influxql(
        spark, tables,
        "SELECT percentile(note, 50), host FROM m GROUP BY time(1h)",
    )
    assert out.count() == 0
