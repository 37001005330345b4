"""Point-wise math functions (InfluxDB 1.5+ surface): abs/acos/asin/
atan/atan2/ceil/cos/exp/floor/ln/log/log2/log10/pow/round/sin/sqrt/tan
over raw fields or aggregates, composed with select arithmetic.

Semantics pinned here:
- domain errors (sqrt(-1), acos(2), ln(0), log of non-positive) yield
  NULL — the relational mirror of InfluxDB emitting no point;
- ceil/floor/round stay double (InfluxDB floats stay float);
- a bare math call names its column after the function (InfluxDB:
  SELECT abs(a) → column "abs"); composites get synthetic names;
- math composes with aggregates under GROUP BY time(...) and with
  fill() (fill runs on the combined output column);
- raw-field and aggregate arguments cannot mix (InfluxQL restriction).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from ciws_server_spark.plans.influxql import InfluxQLError, run_influxql


@pytest.fixture(scope="module")
def tables(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 6, 0), "A", 4.0, 2),
            (dt.datetime(2024, 1, 1, 6, 30), "A", -9.0, 3),
            (dt.datetime(2024, 1, 1, 7, 0), "B", 0.25, 5),
            (dt.datetime(2024, 1, 1, 7, 30), "B", 0.0, 7),
        ],
        "time timestamp, host string, value double, n bigint",
    )
    return {"m": df}


def _vals(got, col):
    return [r[col] for r in got.orderBy("time").collect()]


def test_sqrt_domain_error_is_null(spark, tables):
    got = run_influxql(spark, tables, "SELECT sqrt(value) FROM m")
    assert got.columns == ["time", "sqrt"]
    assert _vals(got, "sqrt") == [2.0, None, 0.5, 0.0]


def test_abs_alongside_plain_field(spark, tables):
    got = run_influxql(spark, tables, "SELECT abs(value), value FROM m")
    assert set(got.columns) == {"time", "abs", "value"}
    assert _vals(got, "abs") == [4.0, 9.0, 0.25, 0.0]


def test_every_unary_function_value(spark, tables):
    # one positive in-domain probe per function, vs python math
    probes = {
        "acos": math.acos(0.25),
        "asin": math.asin(0.25),
        "atan": math.atan(0.25),
        "cos": math.cos(0.25),
        "exp": math.exp(0.25),
        "ln": math.log(0.25),
        "log2": math.log2(0.25),
        "log10": math.log10(0.25),
        "sin": math.sin(0.25),
        "tan": math.tan(0.25),
    }
    for fn, want in probes.items():
        got = run_influxql(
            spark, tables,
            f"SELECT {fn}(value) FROM m WHERE host = 'B' "
            "AND time < '2024-01-01 07:15:00'",
        )
        assert got.columns == ["time", fn], fn
        (row,) = got.collect()
        assert row[fn] == pytest.approx(want), fn


def test_ceil_floor_round_stay_double(spark, tables):
    got = run_influxql(
        spark, tables,
        "SELECT ceil(value) AS c, floor(value) AS f, round(value) AS r "
        "FROM m",
    )
    types = dict(got.dtypes)
    assert types["c"] == types["f"] == types["r"] == "double"
    rows = got.orderBy("time").collect()
    assert [r["c"] for r in rows] == [4.0, -9.0, 1.0, 0.0]
    assert [r["f"] for r in rows] == [4.0, -9.0, 0.0, 0.0]
    assert [r["r"] for r in rows] == [4.0, -9.0, 0.0, 0.0]


def test_two_arg_forms(spark, tables):
    got = run_influxql(spark, tables, "SELECT pow(value, 2) AS sq FROM m")
    assert _vals(got, "sq") == [16.0, 81.0, 0.0625, 0.0]
    got = run_influxql(spark, tables, "SELECT log(value, 2) FROM m")
    assert _vals(got, "log") == [2.0, None, -2.0, None]
    got = run_influxql(spark, tables, "SELECT atan2(value, n) FROM m")
    want = [math.atan2(4.0, 2), math.atan2(-9.0, 3),
            math.atan2(0.25, 5), math.atan2(0.0, 7)]
    assert _vals(got, "atan2") == pytest.approx(want)


def test_math_in_arithmetic_and_unary_minus(spark, tables):
    got = run_influxql(
        spark, tables,
        "SELECT round(value) + ceil(value) AS rc FROM m",
    )
    assert _vals(got, "rc") == [8.0, -18.0, 1.0, 0.0]
    got = run_influxql(spark, tables, "SELECT -value AS neg FROM m")
    assert _vals(got, "neg") == [-4.0, 9.0, -0.25, -0.0]
    got = run_influxql(
        spark, tables, "SELECT pow(value, -1) AS inv FROM m"
    )
    # 0^-1 → +Inf in both Spark and DuckDB pow — kept, not nulled
    assert _vals(got, "inv") == [0.25, -1.0 / 9.0, 4.0, math.inf]


def test_math_over_aggregate_with_bucket_and_fill(spark, tables):
    got = run_influxql(
        spark, tables,
        "SELECT abs(mean(value)) FROM m "
        "WHERE time >= '2024-01-01 06:00:00' "
        "AND time < '2024-01-01 09:00:00' "
        "GROUP BY time(1h), host fill(0)",
    )
    assert set(got.columns) == {"time_bucket", "host", "abs"}
    by_key = {
        (r["time_bucket"].hour, r["host"]): r["abs"] for r in got.collect()
    }
    assert by_key[(6, "A")] == 2.5  # |(4 − 9)/2|
    assert by_key[(7, "B")] == 0.125
    # fill(0) fills the OUTPUT column on the dense axis
    assert by_key[(7, "A")] == 0.0
    assert by_key[(6, "B")] == 0.0
    assert by_key[(8, "A")] == 0.0 and by_key[(8, "B")] == 0.0


def test_math_agg_composite(spark, tables):
    got = run_influxql(
        spark, tables,
        "SELECT abs(sum(value)) / count(value) AS x FROM m GROUP BY host",
    )
    by_host = {r["host"]: r["x"] for r in got.collect()}
    assert by_host == {"A": 2.5, "B": 0.125}


def test_named_errors(spark, tables):
    for q, frag in [
        ("SELECT pow(value) FROM m", "exactly 2"),
        ("SELECT abs(value, 2) FROM m", "exactly 1"),
        ("SELECT atan2(value) FROM m", "exactly 2"),
        ("SELECT abs(top(value, 3)) FROM m", "unbalanced"),
        ("SELECT abs(value FROM m", "unbalanced"),
        ("SELECT sqrt(value) + mean(value) FROM m", "cannot mix"),
    ]:
        with pytest.raises(InfluxQLError, match=frag):
            run_influxql(spark, tables, q)


def test_unknown_field_inside_math_is_null_not_crash(spark, tables):
    got = run_influxql(spark, tables, "SELECT abs(nosuch) FROM m")
    assert got.columns == ["time", "abs"]
    assert set(_vals(got, "abs")) == {None}


def test_oracle_differential(spark, tables, tmp_path):
    """sqrt/abs/pow/log over the events fixture vs DuckDB with the
    same NULL-on-domain-error guards the engine applies."""
    import duckdb

    pdf = tables["m"].toPandas()
    con = duckdb.connect()
    con.register("m", pdf)
    got = run_influxql(
        spark, tables,
        "SELECT sqrt(value) AS s, abs(value) AS a, pow(value, 3) AS p "
        "FROM m",
    )
    mine = [
        (r["s"], r["a"], r["p"]) for r in got.orderBy("time").collect()
    ]
    want = con.sql(
        "SELECT CASE WHEN value >= 0 THEN sqrt(value) END AS s, "
        "abs(value) AS a, pow(value, 3) AS p FROM m ORDER BY time"
    ).fetchall()
    assert mine == [tuple(w) for w in want]
