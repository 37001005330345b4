"""InfluxQL front-end: the reference's exercised query shape + the
time-bucket aggregation surface, translated to DataFrame plans."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def flow(spark):
    base = dt.datetime(2021, 3, 1)
    rows = []
    for b in ("A", "B"):
        for i in range(120):
            rows.append(
                (base + dt.timedelta(minutes=i), b, float(i % 7), float(i))
            )
    return spark.createDataFrame(
        rows, ["time", "buildingID", "hotOutFlowRate", "coldInFlowRate"]
    )


def test_reference_exercised_shape(spark, flow):
    """The one query the reference issues (tag + closed time range)."""
    from ciws_server_spark.plans.influxql import query_measurement

    q = (
        "SELECT \"hotOutFlowRate\", \"buildingID\" FROM \"flow\" "
        "WHERE \"buildingID\" = 'A' "
        "AND time >= '2021-03-01 00:10:00' AND time <= '2021-03-01 00:20:00'"
    )
    got = query_measurement(spark, {"flow": flow}, q)
    rows = got.collect()
    assert got.columns == ["time", "hotOutFlowRate", "buildingID"]
    assert len(rows) == 11  # closed range, minute cadence
    assert {r["buildingID"] for r in rows} == {"A"}


def test_time_bucket_aggregation(spark, flow):
    """GROUP BY time(1h), tag with mean/count/first/last."""
    from ciws_server_spark.plans.influxql import query_measurement

    q = (
        "SELECT mean(hotOutFlowRate), count(hotOutFlowRate), "
        "first(coldInFlowRate), last(coldInFlowRate) "
        "FROM flow GROUP BY time(1h), buildingID"
    )
    got = query_measurement(spark, {"flow": flow}, q)
    rows = got.collect()
    assert len(rows) == 4  # 2 hours × 2 buildings
    r = next(
        x
        for x in rows
        if x["buildingID"] == "A"
        and str(x["time_bucket"]) == "2021-03-01 00:00:00"
    )
    assert r["count_hotOutFlowRate"] == 60
    assert r["first_coldInFlowRate"] == 0.0
    assert r["last_coldInFlowRate"] == 59.0
    # cross-check mean against a direct DataFrame aggregation
    exp = (
        flow.where(
            (F.col("buildingID") == "A")
            & (F.col("time") < F.lit("2021-03-01 01:00:00").cast("timestamp"))
        )
        .agg(F.avg("hotOutFlowRate"))
        .collect()[0][0]
    )
    assert abs(r["mean_hotOutFlowRate"] - exp) < 1e-12


def test_limit_and_errors(spark, flow):
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    got = query_measurement(
        spark, {"flow": flow}, "SELECT hotOutFlowRate FROM flow LIMIT 5"
    )
    assert got.count() == 5

    with pytest.raises(InfluxQLError, match="unknown measurement"):
        query_measurement(spark, {"flow": flow}, "SELECT x FROM nope")
    with pytest.raises(InfluxQLError, match="unsupported condition"):
        query_measurement(
            spark, {"flow": flow},
            "SELECT hotOutFlowRate FROM flow WHERE buildingID LIKE 'A%'",
        )
    with pytest.raises(InfluxQLError, match="unparseable"):
        query_measurement(spark, {"flow": flow}, "DROP MEASUREMENT flow")


def test_order_by_time(spark, flow):
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    got = query_measurement(
        spark,
        {"flow": flow},
        "SELECT hotOutFlowRate FROM flow ORDER BY time DESC LIMIT 3",
    ).collect()
    # buildings A and B share each timestamp → the two latest rows tie
    assert [r["time"].minute for r in got] == [59, 59, 58]
    # TakeOrderedAndProject, not a global Sort+Exchange
    plan = query_measurement(
        spark,
        {"flow": flow},
        "SELECT hotOutFlowRate FROM flow ORDER BY time DESC LIMIT 3",
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    # direction defaults to ASC
    got = query_measurement(
        spark,
        {"flow": flow},
        "SELECT hotOutFlowRate FROM flow ORDER BY time LIMIT 2",
    ).collect()
    assert [r["time"].minute for r in got] == [0, 0]

    # bucketed aggregates sort on the bucket
    got = query_measurement(
        spark,
        {"flow": flow},
        "SELECT count(hotOutFlowRate) FROM flow "
        "GROUP BY time(1h) ORDER BY time DESC",
    ).collect()
    assert got[0]["time_bucket"] > got[-1]["time_bucket"]

    with pytest.raises(InfluxQLError, match="ORDER BY time requires"):
        query_measurement(
            spark,
            {"flow": flow},
            "SELECT count(hotOutFlowRate) FROM flow "
            "GROUP BY buildingID ORDER BY time DESC",
        )


def test_slimit(spark, flow):
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    # 2 series (A, B); SLIMIT 1 keeps the first in tag order
    got = query_measurement(
        spark,
        {"flow": flow},
        "SELECT mean(hotOutFlowRate) FROM flow "
        "GROUP BY time(1h), buildingID SLIMIT 1",
    ).collect()
    assert {r["buildingID"] for r in got} == {"A"}
    assert len(got) == 2  # 2 hourly buckets

    # with SLIMIT, LIMIT caps points PER SERIES (InfluxQL semantics)
    got = query_measurement(
        spark,
        {"flow": flow},
        "SELECT mean(hotOutFlowRate) FROM flow "
        "GROUP BY time(1h), buildingID LIMIT 1 SLIMIT 1",
    ).collect()
    assert len(got) == 1 and got[0]["buildingID"] == "A"
    assert got[0]["time_bucket"].hour == 0  # first bucket in time order

    with pytest.raises(InfluxQLError, match="SLIMIT requires"):
        query_measurement(
            spark,
            {"flow": flow},
            "SELECT mean(hotOutFlowRate) FROM flow GROUP BY time(1h) SLIMIT 1",
        )


def test_or_and_not_equal_predicates(spark, flow):
    """Round-3 grammar: !=, OR, and parenthesized combinations."""
    from ciws_server_spark.plans.influxql import query_measurement

    ne = query_measurement(
        spark, {"flow": flow},
        "SELECT hotOutFlowRate FROM flow WHERE buildingID != 'A'",
    )
    assert ne.count() == 120  # only B rows survive

    both = query_measurement(
        spark, {"flow": flow},
        "SELECT hotOutFlowRate FROM flow "
        "WHERE buildingID = 'A' OR buildingID = 'B'",
    )
    assert both.count() == 240

    # parens: OR group ANDed with a time bound; AND binds tighter
    mixed = query_measurement(
        spark, {"flow": flow},
        "SELECT hotOutFlowRate, buildingID FROM flow "
        "WHERE (buildingID = 'A' OR buildingID = 'B') "
        "AND time >= '2021-03-01 01:00:00' AND time <= '2021-03-01 01:09:00'",
    )
    rows = mixed.collect()
    assert len(rows) == 20  # 10 minutes x 2 buildings
    assert {r["buildingID"] for r in rows} == {"A", "B"}


def test_regex_predicates(spark, flow):
    """Round-3 grammar: =~ /re/ and !~ /re/ tag predicates."""
    import pytest

    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    m = query_measurement(
        spark, {"flow": flow},
        "SELECT hotOutFlowRate, buildingID FROM flow "
        "WHERE buildingID =~ /^[AB]$/ AND buildingID !~ /B/",
    )
    rows = m.collect()
    assert len(rows) == 120
    assert {r["buildingID"] for r in rows} == {"A"}

    with pytest.raises(InfluxQLError, match="not valid on time"):
        query_measurement(
            spark, {"flow": flow},
            "SELECT hotOutFlowRate FROM flow WHERE time =~ /2021/",
        ).collect()


def test_fill_modes(spark):
    """fill(previous)/fill(0)/fill(null) densify the bucket axis from
    the WHERE range; fill(none) keeps only observed buckets."""
    import datetime as dt

    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    base = dt.datetime(2021, 3, 1)
    # building A has data in hours 0 and 3 only — hours 1-2 are gaps
    rows = [
        (base, "A", 5.0),
        (base + dt.timedelta(hours=3), "A", 9.0),
    ]
    sparse = spark.createDataFrame(rows, ["time", "buildingID", "hotOutFlowRate"])
    q_tpl = (
        "SELECT count(hotOutFlowRate), last(hotOutFlowRate) FROM flow "
        "WHERE time >= '2021-03-01 00:00:00' AND time <= '2021-03-01 03:59:59' "
        "GROUP BY time(1h), buildingID fill({mode})"
    )
    prev = query_measurement(
        spark, {"flow": sparse}, q_tpl.format(mode="previous")
    ).collect()
    assert len(prev) == 4  # dense axis
    assert [r["last_hotOutFlowRate"] for r in prev] == [5.0, 5.0, 5.0, 9.0]
    assert [r["count_hotOutFlowRate"] for r in prev] == [1, 1, 1, 1]  # LOCF'd

    zero = query_measurement(
        spark, {"flow": sparse}, q_tpl.format(mode="0")
    ).collect()
    assert [r["count_hotOutFlowRate"] for r in zero] == [1, 0, 0, 1]

    nul = query_measurement(
        spark, {"flow": sparse}, q_tpl.format(mode="null")
    ).collect()
    assert [r["last_hotOutFlowRate"] for r in nul] == [5.0, None, None, 9.0]

    none = query_measurement(
        spark, {"flow": sparse}, q_tpl.format(mode="none")
    ).collect()
    assert len(none) == 2  # gaps dropped (default behavior)

    # linear: hours 1-2 interpolate between 5.0 (h0) and 9.0 (h3);
    # extend the WHERE range to get a trailing empty bucket → null
    lin = query_measurement(
        spark,
        {"flow": sparse},
        "SELECT last(hotOutFlowRate) FROM flow "
        "WHERE time >= '2021-03-01 00:00:00' "
        "AND time <= '2021-03-01 04:59:59' "
        "GROUP BY time(1h), buildingID fill(linear)",
    ).collect()
    got = [r["last_hotOutFlowRate"] for r in sorted(lin, key=lambda r: r["time_bucket"])]
    assert got == [5.0, pytest.approx(6.333333), pytest.approx(7.666667), 9.0, None]

    # InfluxQL rule: fill needs a closed WHERE time range
    with pytest.raises(InfluxQLError, match="closed time range"):
        query_measurement(
            spark, {"flow": sparse},
            "SELECT count(hotOutFlowRate) FROM flow "
            "GROUP BY time(1h) fill(previous)",
        )


def test_time_bucket_offset(spark, flow):
    """time(1h, 30m): bucket boundaries shift by the offset."""
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT count(hotOutFlowRate) FROM flow "
        "WHERE buildingID = 'A' GROUP BY time(1h, 30m)",
    ).collect()
    # minutes 0-119 per building; offset-30 hourly buckets are
    # [23:30,00:30) [00:30,01:30) [01:30,02:30): 30 + 60 + 30 rows
    by_bucket = {str(r["time_bucket"]): r["count_hotOutFlowRate"] for r in got}
    assert by_bucket == {
        "2021-02-28 23:30:00": 30,
        "2021-03-01 00:30:00": 60,
        "2021-03-01 01:30:00": 30,
    }


def test_derivative_raw(spark, flow):
    """Raw-field derivative: Δv/Δt(s) × unit, one row per point after
    the first; GROUP BY tag segments series."""
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT derivative(hotOutFlowRate) FROM flow "
        "WHERE buildingID = 'A'",
    ).collect()
    assert len(got) == 119  # 120 points → 119 differences
    # minute cadence, default unit 1s: (v1 - v0) / 60
    assert got[0]["derivative"] == pytest.approx(1.0 / 60)

    # per-series with an explicit unit: (Δv)/60s × 60s = Δv
    by_series = query_measurement(
        spark, {"flow": flow},
        "SELECT derivative(hotOutFlowRate, 1m) FROM flow GROUP BY buildingID",
    ).collect()
    assert len(by_series) == 238
    a = sorted(
        (r for r in by_series if r["buildingID"] == "A"),
        key=lambda r: r["time"],
    )
    # value cycles 0..6: six +1 steps then one -6 step
    assert a[0]["derivative"] == pytest.approx(1.0)
    assert a[6]["derivative"] == pytest.approx(-6.0)


def test_non_negative_derivative_drops_negatives(spark, flow):
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT non_negative_derivative(hotOutFlowRate, 1m) FROM flow "
        "GROUP BY buildingID",
    ).collect()
    # per series: 119 diffs, 17 of them the -6 wrap → 102 kept
    assert len(got) == 204
    assert all(r["non_negative_derivative"] >= 0 for r in got)


def test_derivative_aggregated(spark, flow):
    """derivative(mean(v), unit) over GROUP BY time buckets: default
    unit is the bucket interval."""
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT derivative(mean(coldInFlowRate), 1h) FROM flow "
        "GROUP BY time(1h), buildingID",
    ).collect()
    # hour means 29.5 → 89.5 per building: Δ60 over 3600s × 3600 = 60
    assert sorted(
        (r["buildingID"], str(r["time_bucket"]), r["derivative"]) for r in got
    ) == [
        ("A", "2021-03-01 01:00:00", 60.0),
        ("B", "2021-03-01 01:00:00", 60.0),
    ]
    # default unit = bucket interval → same result without the 1h arg
    dflt = query_measurement(
        spark, {"flow": flow},
        "SELECT derivative(mean(coldInFlowRate)) FROM flow "
        "GROUP BY time(1h), buildingID",
    ).collect()
    assert sorted(r["derivative"] for r in dflt) == [60.0, 60.0]


def test_moving_average(spark, flow):
    from ciws_server_spark.plans.influxql import query_measurement

    raw = query_measurement(
        spark, {"flow": flow},
        "SELECT moving_average(coldInFlowRate, 3) FROM flow "
        "WHERE buildingID = 'A'",
    ).collect()
    assert len(raw) == 118  # emitted from the 3rd point on
    assert raw[0]["moving_average"] == pytest.approx(1.0)  # mean(0,1,2)

    agg = query_measurement(
        spark, {"flow": flow},
        "SELECT moving_average(mean(coldInFlowRate), 2) FROM flow "
        "GROUP BY time(30m), buildingID",
    ).collect()
    # 30m bucket means per building: 14.5, 44.5, 74.5, 104.5
    assert sorted(
        (r["buildingID"], str(r["time_bucket"]), r["moving_average"])
        for r in agg
    ) == [
        ("A", "2021-03-01 00:30:00", 29.5),
        ("A", "2021-03-01 01:00:00", 59.5),
        ("A", "2021-03-01 01:30:00", 89.5),
        ("B", "2021-03-01 00:30:00", 29.5),
        ("B", "2021-03-01 01:00:00", 59.5),
        ("B", "2021-03-01 01:30:00", 89.5),
    ]


def test_percentile_nearest_rank(spark, flow):
    """InfluxQL nearest-rank: 1-based index floor(n*p/100 + 0.5)."""
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT percentile(coldInFlowRate, 50) FROM flow "
        "GROUP BY time(1h), buildingID",
    ).collect()
    # hour buckets hold values 0..59 / 60..119: n=60, idx=floor(30.5)=30
    # → 30th smallest = 29.0 / 89.0
    assert sorted(
        (r["buildingID"], str(r["time_bucket"]), r["percentile_coldInFlowRate"])
        for r in got
    ) == [
        ("A", "2021-03-01 00:00:00", 29.0),
        ("A", "2021-03-01 01:00:00", 89.0),
        ("B", "2021-03-01 00:00:00", 29.0),
        ("B", "2021-03-01 01:00:00", 89.0),
    ]
    # composes with other aggregates in one SELECT
    mixed = query_measurement(
        spark, {"flow": flow},
        "SELECT percentile(coldInFlowRate, 100), max(coldInFlowRate) "
        "FROM flow GROUP BY buildingID",
    ).collect()
    for r in mixed:
        assert r["percentile_coldInFlowRate"] == r["max_coldInFlowRate"]


def test_transform_grammar_errors(spark, flow):
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    with pytest.raises(InfluxQLError, match="only select item"):
        query_measurement(
            spark, {"flow": flow},
            "SELECT derivative(hotOutFlowRate), coldInFlowRate FROM flow",
        )
    with pytest.raises(InfluxQLError, match="GROUP BY time"):
        query_measurement(
            spark, {"flow": flow},
            "SELECT derivative(mean(hotOutFlowRate)) FROM flow",
        )
    with pytest.raises(InfluxQLError, match="aggregate transform argument"):
        query_measurement(
            spark, {"flow": flow},
            "SELECT derivative(hotOutFlowRate) FROM flow GROUP BY time(1h)",
        )
    with pytest.raises(InfluxQLError, match="positive integer"):
        query_measurement(
            spark, {"flow": flow},
            "SELECT moving_average(hotOutFlowRate) FROM flow",
        )
    with pytest.raises(InfluxQLError, match="bad duration"):
        query_measurement(
            spark, {"flow": flow},
            "SELECT derivative(hotOutFlowRate, 5x) FROM flow",
        )


def test_slimit_limit_without_bucket(spark, flow):
    """LIMIT composed with SLIMIT caps points per series even when the
    output has no time column (tag-only GROUP BY → 1 row/series)."""
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT mean(hotOutFlowRate) FROM flow "
        "GROUP BY buildingID LIMIT 5 SLIMIT 1",
    ).collect()
    assert len(got) == 1
    assert got[0]["buildingID"] == "A"


def test_difference_and_cumulative_sum(spark, flow):
    from ciws_server_spark.plans.influxql import query_measurement

    diff = query_measurement(
        spark, {"flow": flow},
        "SELECT difference(hotOutFlowRate) FROM flow WHERE buildingID = 'A'",
    ).collect()
    assert len(diff) == 119
    assert diff[0]["difference"] == 1.0
    assert any(r["difference"] == -6.0 for r in diff)  # the 6→0 wrap

    nnd = query_measurement(
        spark, {"flow": flow},
        "SELECT non_negative_difference(hotOutFlowRate) FROM flow "
        "WHERE buildingID = 'A'",
    ).collect()
    assert len(nnd) == 102  # 17 wrap steps dropped
    assert all(r["non_negative_difference"] >= 0 for r in nnd)

    cs = query_measurement(
        spark, {"flow": flow},
        "SELECT cumulative_sum(coldInFlowRate) FROM flow "
        "WHERE buildingID = 'A'",
    ).collect()
    assert len(cs) == 120  # emitted at every point
    assert cs[-1]["cumulative_sum"] == sum(range(120))

    # aggregated form: running sum of bucket counts per series
    agg = query_measurement(
        spark, {"flow": flow},
        "SELECT cumulative_sum(count(coldInFlowRate)) FROM flow "
        "GROUP BY time(30m), buildingID",
    ).collect()
    a = sorted(
        (str(r["time_bucket"]), r["cumulative_sum"])
        for r in agg
        if r["buildingID"] == "A"
    )
    assert [x[1] for x in a] == [30.0, 60.0, 90.0, 120.0]


def test_elapsed_units(spark, flow):
    from ciws_server_spark.plans.influxql import query_measurement

    ns = query_measurement(
        spark, {"flow": flow},
        "SELECT elapsed(coldInFlowRate) FROM flow WHERE buildingID = 'A'",
    ).collect()
    assert len(ns) == 119
    assert ns[0]["elapsed"] == 60_000_000_000  # 1 min in ns (default unit)

    mins = query_measurement(
        spark, {"flow": flow},
        "SELECT elapsed(coldInFlowRate, 1m) FROM flow WHERE buildingID = 'A'",
    ).collect()
    assert all(r["elapsed"] == 1 for r in mins)


def test_stats_aggregates(spark, flow):
    """spread / median / mode / stddev per InfluxQL semantics."""
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT spread(coldInFlowRate), median(coldInFlowRate), "
        "mode(hotOutFlowRate) FROM flow GROUP BY buildingID",
    ).collect()
    for r in got:
        assert r["spread_coldInFlowRate"] == 119.0
        assert r["median_coldInFlowRate"] == 59.5  # even n: mean of middles
        # hotOutFlowRate cycles 0..6 over 120 points: 0 occurs 18
        # times (most frequent) — and is also the tie-smallest
        assert r["mode_hotOutFlowRate"] == 0.0

    # odd-count median: middle value exactly
    odd = query_measurement(
        spark, {"flow": flow},
        "SELECT median(coldInFlowRate) FROM flow "
        "WHERE buildingID = 'A' AND time <= '2021-03-01 00:04:00'",
    ).collect()
    assert odd[0]["median_coldInFlowRate"] == 2.0  # of [0,1,2,3,4]

    # mode tie-break: values 1.0 and 2.0 both occur twice → smallest
    import datetime as dt

    base = dt.datetime(2021, 3, 1)
    tie = spark.createDataFrame(
        [(base + dt.timedelta(minutes=i), v)
         for i, v in enumerate([2.0, 1.0, 2.0, 1.0, 3.0])],
        ["time", "v"],
    )
    got = query_measurement(
        spark, {"flow": tie}, "SELECT mode(v) FROM flow"
    ).collect()
    assert got[0]["mode_v"] == 1.0


def test_integral_trapezoid(spark, flow):
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT integral(coldInFlowRate, 1h) FROM flow "
        "GROUP BY time(1h), buildingID",
    ).collect()
    # hour 0 values 0..59 at minute cadence: sum of trapezoids
    # (i-0.5)*60s scaled to hours = (sum(1..59) - 59*0.5)/60
    expect_h0 = (sum(range(1, 60)) - 59 * 0.5) / 60
    a = {
        str(r["time_bucket"]): r["integral"]
        for r in got
        if r["buildingID"] == "A"
    }
    assert a["2021-03-01 00:00:00"] == pytest.approx(expect_h0)
    # integral is per-bucket (no trapezoid spans the boundary): hour 1
    # holds 59 trapezoids of mean value (60+i-0.5), i.e. h0's sum
    # shifted up by 59×60s-worth = +59.0 hours·units
    assert a["2021-03-01 01:00:00"] == pytest.approx(expect_h0 + 59.0)


def test_show_statements(spark, flow):
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    t = {"flow": flow}
    assert [r["name"] for r in query_measurement(
        spark, t, "SHOW MEASUREMENTS"
    ).collect()] == ["flow"]
    assert [r["tagKey"] for r in query_measurement(
        spark, t, "SHOW TAG KEYS FROM flow"
    ).collect()] == ["buildingID"]
    fields = {
        r["fieldKey"]: r["fieldType"]
        for r in query_measurement(
            spark, t, "SHOW FIELD KEYS FROM flow"
        ).collect()
    }
    assert fields == {
        "hotOutFlowRate": "float",
        "coldInFlowRate": "float",
    }
    with pytest.raises(InfluxQLError, match="unknown measurement"):
        query_measurement(spark, t, "SHOW TAG KEYS FROM nope")


def test_subquery_nesting(spark, flow):
    """InfluxQL subqueries: inner statement translated first, its
    result frame is the outer statement's measurement (inner bucket =
    outer time)."""
    from ciws_server_spark.plans.influxql import query_measurement

    t = {"flow": flow}
    # max of the hourly mean — the canonical nested shape
    got = query_measurement(
        spark, t,
        "SELECT max(mean_coldInFlowRate) FROM "
        "(SELECT mean(coldInFlowRate) FROM flow "
        "GROUP BY time(1h), buildingID) GROUP BY buildingID",
    ).collect()
    assert sorted(
        (r["buildingID"], r["max_mean_coldInFlowRate"]) for r in got
    ) == [("A", 89.5), ("B", 89.5)]

    # outer re-buckets the inner rollup onto a coarser axis
    got = query_measurement(
        spark, t,
        "SELECT sum(count_coldInFlowRate) FROM "
        "(SELECT count(coldInFlowRate) FROM flow "
        "GROUP BY time(30m), buildingID) GROUP BY time(1h)",
    ).collect()
    assert sorted(
        (str(r["time_bucket"]), r["sum_count_coldInFlowRate"]) for r in got
    ) == [
        ("2021-03-01 00:00:00", 120),
        ("2021-03-01 01:00:00", 120),
    ]

    # transforms compose over subqueries too
    got = query_measurement(
        spark, t,
        "SELECT difference(max_coldInFlowRate) FROM "
        "(SELECT max(coldInFlowRate) FROM flow "
        "GROUP BY time(30m), buildingID) GROUP BY buildingID",
    ).collect()
    # 30m bucket maxima 29,59,89,119 → differences all 30
    assert len(got) == 6
    assert all(r["difference"] == 30.0 for r in got)


def test_group_by_star(spark, flow):
    """GROUP BY * groups by every tag (string column) of the
    measurement."""
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT count(hotOutFlowRate) FROM flow GROUP BY time(1h), *",
    ).collect()
    assert len(got) == 4  # 2 buckets × 2 buildings
    assert {r["buildingID"] for r in got} == {"A", "B"}
    # identical to naming the tag explicitly
    explicit = query_measurement(
        spark, {"flow": flow},
        "SELECT count(hotOutFlowRate) FROM flow "
        "GROUP BY time(1h), buildingID",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, explicit))


def test_top_bottom_selectors(spark, flow):
    """top/bottom return the n extreme POINTS (original timestamps),
    per bucket/series; ties resolve to the earlier timestamp."""
    from ciws_server_spark.plans.influxql import query_measurement

    t = {"flow": flow}
    got = query_measurement(
        spark, t,
        "SELECT top(coldInFlowRate, 2) FROM flow "
        "WHERE buildingID = 'A' GROUP BY time(1h)",
    ).collect()
    # per hour: the 2 largest values with their own timestamps
    assert sorted((r["time"].minute, r["top"]) for r in got) == [
        (58, 58.0), (58, 118.0), (59, 59.0), (59, 119.0),
    ]

    got = query_measurement(
        spark, t,
        "SELECT bottom(coldInFlowRate, 1) FROM flow GROUP BY buildingID",
    ).collect()
    assert sorted((r["buildingID"], r["bottom"]) for r in got) == [
        ("A", 0.0), ("B", 0.0),
    ]

    # tie-break: equal values → earlier timestamp wins
    import datetime as dt

    base = dt.datetime(2021, 3, 1)
    tie = spark.createDataFrame(
        [(base + dt.timedelta(minutes=i), v)
         for i, v in enumerate([5.0, 5.0, 1.0])],
        ["time", "v"],
    )
    got = query_measurement(
        spark, {"flow": tie}, "SELECT top(v, 1) FROM flow"
    ).collect()
    assert got[0]["time"].minute == 0


def test_agg_star_applies_to_every_field(spark, flow):
    """InfluxQL agg(*): the aggregate expands to every numeric field."""
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT mean(*) FROM flow GROUP BY buildingID",
    ).collect()
    r = next(x for x in got if x["buildingID"] == "A")
    assert r["mean_hotOutFlowRate"] == pytest.approx(2.975)
    assert r["mean_coldInFlowRate"] == pytest.approx(59.5)


def test_transform_argument_must_be_field_shaped(spark, flow):
    """Totality regression (r11, found by the seeded 10k statement
    fuzz once tz() shifted the RNG stream): a transform inner argument
    that is not identifier-shaped — mutated garbage like
    ``integral(la\\st(bogusField))``, or _AGG_RE's lazy body
    swallowing ``mean(f) mean(g)`` — must raise the NAMED error, not
    reach F.col() and leak AnalysisException."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    t = {"flow": flow}
    for q in (
        r"SELECT integral(la\st(bogusField)) FROM flow GROUP BY time(3mo)",
        "SELECT derivative(mean(f) mean(g)) FROM flow GROUP BY time(1h)",
        "SELECT integral(mean(*)) FROM flow GROUP BY time(1h)",
    ):
        with pytest.raises(InfluxQLError, match="unparseable transform"):
            query_measurement(spark, t, q)


def test_tz_clause(spark):
    """tz('Zone'): WHERE time literals are zone-local; GROUP BY time
    buckets align to local wall time, DST-aware per instant."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    # hourly points spanning the US spring-forward (2021-03-14, CST→CDT)
    base = dt.datetime(2021, 3, 13, 0, 0)  # UTC
    rows = [
        (base + dt.timedelta(hours=h), 1.0) for h in range(72)
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    t = {"m": m}

    got = query_measurement(
        spark, t,
        "SELECT count(v) FROM m GROUP BY time(1d) tz('America/Chicago')",
    ).collect()
    by_bucket = {str(r["time_bucket"]): r["count_v"] for r in got}
    # Chicago midnight = 06:00 UTC under CST, 05:00 UTC under CDT
    assert by_bucket["2021-03-13 06:00:00"] == 24  # full CST day
    assert by_bucket["2021-03-14 06:00:00"] == 23  # spring-forward day
    assert by_bucket["2021-03-15 05:00:00"] == 19  # partial (data ends)

    # WHERE literals are local: 00:00 Chicago == 06:00 UTC (CST)
    got = query_measurement(
        spark, t,
        "SELECT v FROM m WHERE time >= '2021-03-13 00:00:00' "
        "AND time <= '2021-03-13 01:00:00' tz('America/Chicago')",
    ).collect()
    assert [str(r["time"]) for r in got] == [
        "2021-03-13 06:00:00",
        "2021-03-13 07:00:00",
    ]

    with pytest.raises(InfluxQLError, match="unknown time zone"):
        query_measurement(
            spark, t, "SELECT count(v) FROM m GROUP BY time(1d) tz('Mars')"
        )


def test_tz_fill_composes(spark):
    """tz() + fill() (r11): the dense axis is generated on the LOCAL
    wall-clock grid and converted back to UTC instants, so buckets
    stay aligned to local midnight across the DST transition and
    trailing empty local days densify."""
    from ciws_server_spark.plans.influxql import query_measurement

    base = dt.datetime(2021, 3, 13, 0, 0)  # UTC; spring-forward 3/14
    rows = [(base + dt.timedelta(hours=h), 1.0) for h in range(72)]
    m = spark.createDataFrame(rows, ["time", "v"])
    t = {"m": m}

    got = query_measurement(
        spark, t,
        "SELECT count(v) FROM m "
        "WHERE time >= '2021-03-13 00:00:00' "
        "AND time <= '2021-03-18 00:00:00' "
        "GROUP BY time(1d) fill(0) tz('America/Chicago')",
    ).collect()
    by_bucket = {str(r["time_bucket"]): r["count_v"] for r in got}
    assert by_bucket == {
        "2021-03-13 06:00:00": 24,  # full CST local day
        "2021-03-14 06:00:00": 23,  # spring-forward: 23-hour local day
        "2021-03-15 05:00:00": 19,  # CDT; data ends 3/15 23:00 UTC
        "2021-03-16 05:00:00": 0,   # filled — axis on LOCAL midnights
        "2021-03-17 05:00:00": 0,
        "2021-03-18 05:00:00": 0,
    }


def test_tz_fill_linear_interpolates_on_utc_instants(spark):
    """tz() + fill(linear): the empty local day between two points
    interpolates on REAL elapsed time between the (DST-uneven) UTC
    bucket instants — 3/13 06:00Z → 3/14 06:00Z → 3/15 05:00Z, so the
    middle bucket sits 24h into a 47h span: 10 + 10·(24/47)."""
    from ciws_server_spark.plans.influxql import query_measurement

    rows = [
        (dt.datetime(2021, 3, 13, 12, 0), 10.0),  # local day 3/13
        (dt.datetime(2021, 3, 15, 12, 0), 20.0),  # local day 3/15 (CDT)
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    got = query_measurement(
        spark, {"m": m},
        "SELECT min(v) FROM m "
        "WHERE time >= '2021-03-13 00:00:00' "
        "AND time <= '2021-03-15 23:00:00' "
        "GROUP BY time(1d) fill(linear) tz('America/Chicago')",
    ).collect()
    by_bucket = {str(r["time_bucket"]): r["min_v"] for r in got}
    assert by_bucket["2021-03-13 06:00:00"] == 10.0
    assert by_bucket["2021-03-15 05:00:00"] == 20.0
    assert by_bucket["2021-03-14 06:00:00"] == pytest.approx(
        10.0 + 10.0 * 24.0 / 47.0, abs=1e-6
    )


def test_tz_absolute_literals(spark):
    """Under tz(), epoch-integer and zone-suffixed time literals are
    ABSOLUTE instants (InfluxQL shifts only plain strings) — r11
    upstream-parity fix."""
    from ciws_server_spark.plans.influxql import query_measurement

    base = dt.datetime(2021, 3, 13, 0, 0)  # UTC
    rows = [(base + dt.timedelta(hours=h), 1.0) for h in range(72)]
    m = spark.createDataFrame(rows, ["time", "v"])
    t = {"m": m}

    # 1615593600 = 2021-03-13 00:00:00 UTC; +2h upper bound
    got = query_measurement(
        spark, t,
        "SELECT v FROM m WHERE time >= 1615593600000000000 "
        "AND time <= 1615600800000000000 tz('America/Chicago')",
    ).collect()
    assert [str(r["time"]) for r in got] == [
        "2021-03-13 00:00:00",
        "2021-03-13 01:00:00",
        "2021-03-13 02:00:00",
    ]

    got = query_measurement(
        spark, t,
        "SELECT v FROM m WHERE time >= '2021-03-13T00:00:00Z' "
        "AND time <= '2021-03-13T02:00:00Z' tz('America/Chicago')",
    ).collect()
    assert len(got) == 3  # zone-suffixed == absolute, not re-shifted

    # epoch bounds still drive a tz-local fill axis (bounds are
    # re-framed to local wall time at plan time): 00:00Z 3/13 falls in
    # local day 3/12, so the axis starts at 3/12 06:00Z (CST midnight)
    got = query_measurement(
        spark, t,
        "SELECT count(v) FROM m WHERE time >= 1615593600000000000 "
        "AND time <= 1615766400000000000 "  # 2021-03-15 00:00:00 UTC
        "GROUP BY time(1d) fill(0) tz('America/Chicago')",
    ).collect()
    buckets = [str(r["time_bucket"]) for r in got]
    assert buckets[0] == "2021-03-12 06:00:00"
    assert {str(r["time_bucket"]): r["count_v"] for r in got}[
        "2021-03-12 06:00:00"
    ] == 6  # 00:00Z–05:59Z of 3/13 sit in local day 3/12


def test_distinct_function(spark, flow):
    from ciws_server_spark.plans.influxql import query_measurement

    got = query_measurement(
        spark, {"flow": flow},
        "SELECT distinct(hotOutFlowRate) FROM flow GROUP BY buildingID",
    ).collect()
    # values cycle 0..6 per building
    per = {}
    for r in got:
        per.setdefault(r["buildingID"], set()).add(r["distinct"])
    assert per == {
        "A": set(float(i) for i in range(7)),
        "B": set(float(i) for i in range(7)),
    }

    # bucketed: distinct per (bucket, series)
    got = query_measurement(
        spark, {"flow": flow},
        "SELECT distinct(hotOutFlowRate) FROM flow "
        "GROUP BY time(1h), buildingID",
    ).collect()
    assert len(got) == 2 * 2 * 7  # 2 buckets x 2 buildings x 7 values


def test_select_into_writes_target(spark, flow, tmp_path):
    """SELECT ... INTO: the continuous-query write-back shape — the
    hourly rollup lands as a partitioned table."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        execute_into,
        query_measurement,
    )

    got = execute_into(
        spark,
        {"flow": flow},
        "SELECT mean(coldInFlowRate) INTO campus_flow_hourly FROM flow "
        "GROUP BY time(1h), buildingID",
        str(tmp_path),
    ).collect()
    assert len(got) == 4  # 2 hours x 2 buildings
    r = next(
        x for x in got
        if x["buildingID"] == "A" and str(x["time"]) == "2021-03-01 00:00:00"
    )
    assert r["mean_coldInFlowRate"] == 29.5
    # campus_flow_hourly is PARTITIONING-listed → buildingID/date dirs
    import os

    assert os.path.isdir(
        str(tmp_path / "campus_flow_hourly" / "buildingID=A"
            / "date=2021-03-01")
    )

    # translate() refuses write statements
    with pytest.raises(InfluxQLError, match="INTO is a write"):
        query_measurement(
            spark, {"flow": flow},
            "SELECT mean(coldInFlowRate) INTO x FROM flow GROUP BY time(1h)",
        )


def test_select_into_with_tz_fill(spark, tmp_path):
    """INTO composed with tz() + fill() (r11): the written rollup
    carries DST-aware local-midnight bucket instants and the filled
    empty local days — the localized-dashboard continuous-query
    shape, end-to-end through the write path."""
    from ciws_server_spark.plans.influxql import execute_into

    rows = [
        (dt.datetime(2021, 3, 13, 0, 0) + dt.timedelta(hours=h), "A", 1.0)
        for h in range(72)
    ]
    m = spark.createDataFrame(rows, "time timestamp, buildingID string, v double")
    got = execute_into(
        spark,
        {"m": m},
        "SELECT count(v) INTO rollup FROM m "
        "WHERE time >= '2021-03-13 00:00:00' "
        "AND time <= '2021-03-17 00:00:00' "
        "GROUP BY time(1d) fill(0) tz('America/Chicago')",
        str(tmp_path),
    ).collect()
    written = spark.read.parquet(str(tmp_path / "rollup"))
    by_bucket = {str(r["time"]): r["count_v"] for r in written.collect()}
    assert by_bucket == {
        "2021-03-13 06:00:00": 24.0,
        "2021-03-14 06:00:00": 23.0,  # spring-forward local day
        "2021-03-15 05:00:00": 19.0,
        "2021-03-16 05:00:00": 0.0,   # filled local days persisted
        "2021-03-17 05:00:00": 0.0,
    }
    assert len(got) == 5


def test_exponential_moving_average(spark, flow):
    """EMA: α=2/(n+1) recursion seeded with the first point, emitted
    from the n-th — raw-field form, per-series."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    got = query_measurement(
        spark,
        {"flow": flow},
        "SELECT exponential_moving_average(coldInFlowRate, 3) FROM flow "
        "GROUP BY buildingID",
    )
    # per-series: 120 points per building, emitted from the 3rd
    by_b = {}
    for r in got.collect():
        by_b.setdefault(r["buildingID"], []).append(r)
    assert {len(v) for v in by_b.values()} == {118}
    # hand-rolled recursion on series A: v = 0,1,2,..., α = 0.5
    a = 0.5
    e = 0.0
    vals = [float(i) for i in range(120)]
    emas = []
    for i, x in enumerate(vals):
        e = x if i == 0 else a * x + (1 - a) * e
        emas.append(e)
    got_a = sorted(by_b["A"], key=lambda r: r["time"])
    assert [r["exponential_moving_average"] for r in got_a[:4]] == emas[2:6]

    with pytest.raises(InfluxQLError, match="positive integer"):
        query_measurement(
            spark,
            {"flow": flow},
            "SELECT exponential_moving_average(coldInFlowRate, 0) FROM flow",
        )


def test_ema_raw_series_cap(spark, flow, monkeypatch):
    """The raw (non-aggregated) EMA form folds a whole series through
    one Python worker, so it enforces a per-series point cap with a
    named error; the aggregated form (buckets × series input) is
    exempt from the cap."""
    from ciws_server_spark.plans import influxql
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    monkeypatch.setattr(influxql, "EMA_RAW_MAX_SERIES_ROWS", 100)
    with pytest.raises(InfluxQLError, match="capped at 100 points"):
        query_measurement(
            spark,
            {"flow": flow},
            "SELECT exponential_moving_average(coldInFlowRate, 3) "
            "FROM flow GROUP BY buildingID",
        ).collect()

    # aggregated form over the same data: bounded input, no cap
    got = query_measurement(
        spark,
        {"flow": flow},
        "SELECT exponential_moving_average(mean(coldInFlowRate), 3) "
        "FROM flow WHERE time >= '2021-03-01' AND time < '2021-03-02' "
        "GROUP BY time(10m), buildingID",
    )
    assert got.count() > 0


def test_offset_soffset_pagination(spark, flow):
    """OFFSET pages points, SOFFSET pages series; SOFFSET without
    SLIMIT raises; 1w buckets are fixed epoch-aligned spans."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    base = query_measurement(
        spark, {"flow": flow},
        "SELECT \"coldInFlowRate\" FROM flow WHERE \"buildingID\" = 'A' "
        "ORDER BY time ASC LIMIT 10",
    ).collect()
    page2 = query_measurement(
        spark, {"flow": flow},
        "SELECT \"coldInFlowRate\" FROM flow WHERE \"buildingID\" = 'A' "
        "ORDER BY time ASC LIMIT 5 OFFSET 5",
    ).collect()
    assert [r["time"] for r in page2] == [r["time"] for r in base[5:]]

    # series pagination: skip series A, keep B
    got = query_measurement(
        spark, {"flow": flow},
        "SELECT count(coldInFlowRate) FROM flow "
        "WHERE time >= '2021-03-01' AND time < '2021-03-02' "
        "GROUP BY time(1h), buildingID SLIMIT 1 SOFFSET 1",
    ).collect()
    assert {r["buildingID"] for r in got} == {"B"}

    with pytest.raises(InfluxQLError, match="SOFFSET requires SLIMIT"):
        query_measurement(
            spark, {"flow": flow},
            "SELECT count(coldInFlowRate) FROM flow "
            "GROUP BY buildingID SOFFSET 1",
        )

    # 1w bucket: the 2021-03-01 fixture falls entirely in the epoch
    # week starting Thursday 2021-02-25
    wk = query_measurement(
        spark, {"flow": flow},
        "SELECT count(coldInFlowRate) FROM flow "
        "WHERE time >= '2021-03-01' AND time < '2021-03-08' "
        "GROUP BY time(1w)",
    ).collect()
    assert len(wk) == 1
    assert str(wk[0]["time_bucket"]).startswith("2021-02-25")


def test_show_tag_values(spark, flow):
    """SHOW TAG VALUES FROM m WITH KEY = "k" — distinct tag values,
    the one metadata statement that scans."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    got = query_measurement(
        spark, {"flow": flow},
        'SHOW TAG VALUES FROM flow WITH KEY = "buildingID"',
    ).collect()
    assert [(r["key"], r["value"]) for r in got] == [
        ("buildingID", "A"),
        ("buildingID", "B"),
    ]

    with pytest.raises(InfluxQLError, match="requires WITH KEY"):
        query_measurement(spark, {"flow": flow}, "SHOW TAG VALUES FROM flow")
    # unknown / field-typed key → empty result, not an error
    # (InfluxDB 1.x parity: SHOW TAG VALUES for a key the
    # measurement doesn't have returns no series)
    got = query_measurement(
        spark, {"flow": flow},
        'SHOW TAG VALUES FROM flow WITH KEY = "hotOutFlowRate"',
    ).collect()
    assert got == []

    # the other three upstream key forms (r11): IN-list, =~, !~
    got = query_measurement(
        spark, {"flow": flow},
        'SHOW TAG VALUES FROM flow WITH KEY IN ("buildingID", nosuch)',
    ).collect()
    assert [(r["key"], r["value"]) for r in got] == [
        ("buildingID", "A"),
        ("buildingID", "B"),
    ]
    got = query_measurement(
        spark, {"flow": flow},
        "SHOW TAG VALUES FROM flow WITH KEY =~ /ID$/",
    ).collect()
    assert {r["key"] for r in got} == {"buildingID"}
    got = query_measurement(
        spark, {"flow": flow},
        "SHOW TAG VALUES FROM flow WITH KEY !~ /ID$/",
    ).collect()
    assert got == []  # buildingID is the only tag key
    with pytest.raises(InfluxQLError, match="names no keys"):
        query_measurement(
            spark, {"flow": flow},
            "SHOW TAG VALUES FROM flow WITH KEY IN ()",
        )
    with pytest.raises(InfluxQLError, match="empty regex"):
        query_measurement(
            spark, {"flow": flow},
            "SHOW TAG VALUES FROM flow WITH KEY =~ //",
        )


def test_calendar_month_bucket(spark):
    """EXTENSION time(1mo): calendar truncation across month/year
    boundaries (InfluxQL 1.x has no calendar units — documented
    divergence in plans/influxql.py)."""
    from ciws_server_spark.plans.influxql import query_measurement

    rows = [
        (dt.datetime(2023, 12, 30, 23, 0), 1.0),
        (dt.datetime(2023, 12, 31, 5, 0), 2.0),
        (dt.datetime(2024, 1, 1, 0, 0), 3.0),
        (dt.datetime(2024, 1, 31, 23, 59), 4.0),
        (dt.datetime(2024, 2, 29, 12, 0), 5.0),  # leap February
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    got = query_measurement(
        spark, {"m": m}, "SELECT count(v), mean(v) FROM m GROUP BY time(1mo)"
    ).collect()
    by_bucket = {str(r["time_bucket"]): r for r in got}
    assert set(by_bucket) == {
        "2023-12-01 00:00:00", "2024-01-01 00:00:00", "2024-02-01 00:00:00"
    }
    assert by_bucket["2023-12-01 00:00:00"]["count_v"] == 2
    assert by_bucket["2024-01-01 00:00:00"]["mean_v"] == 3.5
    assert by_bucket["2024-02-01 00:00:00"]["count_v"] == 1

    # time(1y) folds all of 2023-12 vs 2024-*
    got = query_measurement(
        spark, {"m": m}, "SELECT count(v) FROM m GROUP BY time(1y)"
    ).collect()
    by_year = {str(r["time_bucket"]): r["count_v"] for r in got}
    assert by_year == {"2023-01-01 00:00:00": 2, "2024-01-01 00:00:00": 3}


def test_calendar_month_tz_local_truncation(spark):
    """time(1mo) with tz(): truncation in LOCAL wall time — a UTC
    instant late on Jan 31 local-west lands in the local January
    bucket even when its UTC date is Feb 1."""
    from ciws_server_spark.plans.influxql import query_measurement

    rows = [
        # 2024-02-01 03:00 UTC == 2024-01-31 19:00 America/Los_Angeles
        (dt.datetime(2024, 2, 1, 3, 0), 1.0),
        # 2024-02-01 12:00 UTC == 2024-02-01 04:00 local
        (dt.datetime(2024, 2, 1, 12, 0), 2.0),
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    got = query_measurement(
        spark, {"m": m},
        "SELECT count(v) FROM m GROUP BY time(1mo) tz('America/Los_Angeles')",
    ).collect()
    by_bucket = {str(r["time_bucket"]): r["count_v"] for r in got}
    # local month starts mapped back to UTC instants (PST = UTC-8)
    assert by_bucket == {
        "2024-01-01 08:00:00": 1,
        "2024-02-01 08:00:00": 1,
    }


def test_calendar_month_fill_axis(spark):
    """fill(0) with time(1mo): the dense axis steps by calendar month
    (28/29/30/31-day spans), so an empty month materializes."""
    from ciws_server_spark.plans.influxql import query_measurement

    rows = [
        (dt.datetime(2024, 1, 15), 1.0),
        # February absent entirely
        (dt.datetime(2024, 3, 20), 3.0),
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    got = query_measurement(
        spark, {"m": m},
        "SELECT count(v) FROM m "
        "WHERE time >= '2024-01-01' AND time <= '2024-03-31' "
        "GROUP BY time(1mo) fill(0)",
    ).collect()
    by_bucket = {str(r["time_bucket"]): r["count_v"] for r in got}
    assert by_bucket == {
        "2024-01-01 00:00:00": 1,
        "2024-02-01 00:00:00": 0,
        "2024-03-01 00:00:00": 1,
    }


def test_calendar_bucket_rejects_untileable_forms(spark):
    """Forms with no calendar meaning raise instead of mis-reading:
    sub-month offsets on calendar buckets and calendar offsets on
    fixed-span buckets (r9 extended multiples/month-aligned offsets —
    those are now legal, tested below; late-r9 also defined the
    derivative default unit per bucket STEP,
    test_calendar_derivative_default_unit)."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    m = spark.createDataFrame([(dt.datetime(2024, 1, 1), 1.0)], ["time", "v"])
    t = {"m": m}
    with pytest.raises(InfluxQLError, match="month-aligned"):
        query_measurement(
            spark, t, "SELECT count(v) FROM m GROUP BY time(1mo, 1d)"
        )
    with pytest.raises(InfluxQLError, match="calendar"):
        query_measurement(
            spark, t, "SELECT count(v) FROM m GROUP BY time(1h, 1mo)"
        )
    with pytest.raises(InfluxQLError, match="> 0"):
        query_measurement(spark, t, "SELECT count(v) FROM m GROUP BY time(0mo)")


def test_calendar_quarter_bucket_tiling(spark):
    """r9 EXTENSION time(3mo): quarters tile the epoch-anchored month
    axis (Jan/Apr/Jul/Oct — DuckDB date_trunc('quarter') semantics),
    across year boundaries."""
    from ciws_server_spark.plans.influxql import query_measurement

    rows = [
        (dt.datetime(2023, 12, 31, 23, 0), 1.0),  # Q4-2023
        (dt.datetime(2024, 1, 1, 0, 0), 2.0),     # Q1-2024
        (dt.datetime(2024, 3, 31, 23, 59), 3.0),  # Q1-2024
        (dt.datetime(2024, 4, 1, 0, 0), 4.0),     # Q2-2024
        (dt.datetime(2024, 11, 5), 5.0),          # Q4-2024
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    got = query_measurement(
        spark, {"m": m}, "SELECT count(v), mean(v) FROM m GROUP BY time(3mo)"
    ).collect()
    by_bucket = {str(r["time_bucket"]): r["count_v"] for r in got}
    assert by_bucket == {
        "2023-10-01 00:00:00": 1,
        "2024-01-01 00:00:00": 2,
        "2024-04-01 00:00:00": 1,
        "2024-10-01 00:00:00": 1,
    }


def test_calendar_bucket_month_aligned_offsets(spark):
    """Month-aligned offsets shift the calendar grid: time(3mo, 1mo)
    = Feb/May/Aug/Nov fiscal quarters; time(1y, 6mo) = July-June
    fiscal years. offset > span lands on the same grid mod span."""
    from ciws_server_spark.plans.influxql import query_measurement

    rows = [
        (dt.datetime(2024, 1, 31), 1.0),   # fiscal Q starting 2023-11
        (dt.datetime(2024, 2, 1), 2.0),    # fiscal Q starting 2024-02
        (dt.datetime(2024, 6, 30), 3.0),   # FY starting 2023-07
        (dt.datetime(2024, 7, 1), 4.0),    # FY starting 2024-07
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    t = {"m": m}
    got = query_measurement(
        spark, t, "SELECT count(v) FROM m GROUP BY time(3mo, 1mo)"
    ).collect()
    by_bucket = {str(r["time_bucket"]): r["count_v"] for r in got}
    assert by_bucket == {
        "2023-11-01 00:00:00": 1,
        "2024-02-01 00:00:00": 1,
        "2024-05-01 00:00:00": 2,
    }
    got = query_measurement(
        spark, t, "SELECT count(v) FROM m GROUP BY time(1y, 6mo)"
    ).collect()
    by_fy = {str(r["time_bucket"]): r["count_v"] for r in got}
    assert by_fy == {
        "2023-07-01 00:00:00": 3,
        "2024-07-01 00:00:00": 1,
    }
    # offset 4mo on a 3mo span ≡ offset 1mo (floor-division grid)
    got = query_measurement(
        spark, t, "SELECT count(v) FROM m GROUP BY time(3mo, 4mo)"
    ).collect()
    assert {str(r["time_bucket"]): r["count_v"] for r in got} == by_bucket


def test_calendar_quarter_fill_axis(spark):
    """fill(0) with time(3mo): the dense axis steps by 3 calendar
    months, so an empty quarter materializes on the quarter grid."""
    from ciws_server_spark.plans.influxql import query_measurement

    rows = [
        (dt.datetime(2024, 2, 15), 1.0),   # Q1
        # Q2 absent entirely
        (dt.datetime(2024, 8, 20), 3.0),   # Q3
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    got = query_measurement(
        spark, {"m": m},
        "SELECT count(v) FROM m "
        "WHERE time >= '2024-01-01' AND time <= '2024-09-30' "
        "GROUP BY time(3mo) fill(0)",
    ).collect()
    by_bucket = {str(r["time_bucket"]): r["count_v"] for r in got}
    assert by_bucket == {
        "2024-01-01 00:00:00": 1,
        "2024-04-01 00:00:00": 0,
        "2024-07-01 00:00:00": 1,
    }


def test_show_databases_and_retention_policies(spark):
    """Admin metadata statements: one logical database + the 1.x
    default autogen policy row (retention in this engine is the
    explicit partition-drop job, so duration reports 0s=infinite)."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    t = {"m": spark.createDataFrame([(dt.datetime(2024, 1, 1), 1.0)],
                                    ["time", "v"])}
    rows = query_measurement(spark, t, "SHOW DATABASES").collect()
    assert [r["name"] for r in rows] == ["ciws"]

    rows = query_measurement(
        spark, t, "SHOW DATABASES", database="prod_metering"
    ).collect()
    assert [r["name"] for r in rows] == ["prod_metering"]

    rp = query_measurement(spark, t, "SHOW RETENTION POLICIES").collect()
    assert len(rp) == 1 and rp[0]["name"] == "autogen"
    assert rp[0]["duration"] == "0s" and rp[0]["default"] is True

    rp = query_measurement(
        spark, t, 'SHOW RETENTION POLICIES ON "ciws"'
    ).collect()
    assert rp[0]["name"] == "autogen"

    with pytest.raises(InfluxQLError, match="unknown database"):
        query_measurement(spark, t, "SHOW RETENTION POLICIES ON nope")


def test_calendar_month_into_writeback(spark, tmp_path):
    """Composition: the calendar-month extension through the
    SELECT ... INTO write-back path — the 'monthly rollup continuous
    query' a dashboard schedules. The bucket lands as the target's
    time column at month starts."""
    from ciws_server_spark.plans.influxql import execute_into

    rows = [
        (dt.datetime(2023, 12, 31, 23, 0), 2.0),
        (dt.datetime(2024, 1, 10), 4.0),
        (dt.datetime(2024, 1, 20), 6.0),
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    got = execute_into(
        spark,
        {"m": m},
        "SELECT mean(v), count(v) INTO monthly_rollup FROM m "
        "GROUP BY time(1mo)",
        str(tmp_path),
    ).collect()
    by_month = {str(r["time"]): (r["mean_v"], r["count_v"]) for r in got}
    assert by_month == {
        "2023-12-01 00:00:00": (2.0, 1),
        "2024-01-01 00:00:00": (5.0, 2),
    }


def test_calendar_derivative_default_unit(spark):
    """Default-unit derivative over calendar buckets: Δv per bucket
    STEP. Adjacent quarters give the plain difference; a k-quarter gap
    gives Δv/k (the calendar analogue of Δt/unit normalization)."""
    from ciws_server_spark.plans.influxql import translate

    rows = [
        # Q1-2023: two points (count = 2); Q2: one; Q4: one (Q3 empty)
        (dt.datetime(2023, 1, 15), 1.0),
        (dt.datetime(2023, 2, 15), 1.0),
        (dt.datetime(2023, 5, 15), 1.0),
        (dt.datetime(2023, 11, 15), 1.0),
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    got = translate(
        m, "SELECT derivative(count(v)) FROM m GROUP BY time(3mo)"
    ).collect()
    by_bucket = {str(r["time_bucket"]): r["derivative"] for r in got}
    assert by_bucket == {
        # Q2 vs Q1: adjacent step, 1 - 2 = -1
        "2023-04-01 00:00:00": -1.0,
        # Q4 vs Q2: two steps apart (Q3 missing), (1-1)/2 = 0
        "2023-10-01 00:00:00": 0.0,
    }


def test_calendar_derivative_explicit_unit_still_wall_clock(spark):
    """An explicit fixed-span unit over calendar buckets keeps rating
    against wall-clock Δt, unchanged by the default-step extension."""
    from ciws_server_spark.plans.influxql import translate

    rows = [
        (dt.datetime(2024, 1, 10), 1.0),
        (dt.datetime(2024, 4, 10), 1.0),
        (dt.datetime(2024, 4, 20), 1.0),
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    got = translate(
        m, "SELECT derivative(count(v), 1d) FROM m GROUP BY time(3mo)"
    ).collect()
    assert len(got) == 1
    # Q1→Q2 bucket starts are 91 days apart in 2024; Δv = 2-1 = 1
    assert abs(got[0]["derivative"] - 1.0 / 91.0) < 1e-12


def _ta_series(spark):
    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), float(v))
        for i, v in enumerate([10, 11, 13, 12, 14, 15])
    ]
    return spark.createDataFrame(rows, ["time", "v"])


def test_ta_window_indicators(spark):
    """CMO and Kaufman ER: hand-computed closed forms over the last n
    deltas (deltas of [10,11,13,12,14,15] = [1,2,-1,2])."""
    from ciws_server_spark.plans.influxql import translate

    m = _ta_series(spark)
    cmo = [
        round(r[-1], 6)
        for r in translate(
            m, "SELECT chande_momentum_oscillator(v, 4) FROM m"
        ).collect()
    ]
    # over deltas [1,2,-1,2]: up 5, down 1 → 100·4/6; then [2,-1,2,1]
    assert cmo == [round(100 * 4 / 6, 6), round(100 * 4 / 6, 6)]
    ker = [
        round(r[-1], 6)
        for r in translate(
            m, "SELECT kaufmans_efficiency_ratio(v, 4) FROM m"
        ).collect()
    ]
    # |14−10|/6 then |15−11|/6
    assert ker == [round(4 / 6, 6), round(4 / 6, 6)]


def test_ta_fold_indicators(spark):
    """KAMA/DEMA/TEMA/TRIX: literal expectations from the documented
    recursions (α = 2/(n+1), states seeded from the series head)."""
    from ciws_server_spark.plans.influxql import translate

    m = _ta_series(spark)

    def got(q):
        out = translate(m, q).orderBy("time").collect()
        return [round(r[-1], 6) for r in out]

    assert got("SELECT kaufmans_adaptive_moving_average(v, 2) FROM m") == [
        13.0, 12.929651, 13.004949, 13.891638,
    ]
    assert got("SELECT double_exponential_moving_average(v, 2) FROM m") == [
        10.888889, 12.814815, 12.222222, 13.835391, 14.97668,
    ]
    assert got("SELECT triple_exponential_moving_average(v, 2) FROM m") == [
        10.962963, 12.962963, 12.123457, 13.912209, 15.017833,
    ]
    assert got("SELECT triple_exponential_derivative(v, 2) FROM m") == [
        8.633094, 4.415011, 6.859291, 7.737964,
    ]


def test_ta_validation_and_out_of_surface(spark):
    from ciws_server_spark.plans.influxql import InfluxQLError, translate

    m = _ta_series(spark)
    with pytest.raises(InfluxQLError, match="positive integer"):
        translate(m, "SELECT relative_strength_index(v) FROM m")
    # holt_winters needs an aggregate + GROUP BY time
    with pytest.raises(InfluxQLError, match="GROUP BY time"):
        translate(m, "SELECT holt_winters(v, 4, 0) FROM m")
    # histogram stays out-of-surface (reserved-but-unimplemented
    # upstream); sample is now a supported deterministic selector
    # (test_sample_selector_deterministic)
    with pytest.raises(InfluxQLError, match="out of surface"):
        translate(m, "SELECT histogram(v) FROM m")
    assert translate(m, "SELECT sample(v, 3) FROM m").count() == 3


def test_holt_winters_recovers_seasonal_trend(spark):
    """Property pin for the additive Holt-Winters fit: a perfectly
    seasonal + linear series must forecast its own continuation
    (SSE-optimal parameters drive the one-step error to ~0), and S=0
    must continue a pure linear trend exactly."""
    from ciws_server_spark.plans.influxql import translate

    rows = []
    for t in range(24):
        v = 10 + 0.5 * t + [3.0, -1.0, -2.0, 0.0][t % 4]
        rows.append((dt.datetime(2024, 1, 1) + dt.timedelta(hours=t), v))
    m = spark.createDataFrame(rows, ["time", "v"])
    out = translate(
        m, "SELECT holt_winters(mean(v), 4, 4) FROM m GROUP BY time(1h)"
    ).collect()
    exp = [10 + 0.5 * t + [3.0, -1.0, -2.0, 0.0][t % 4] for t in range(24, 28)]
    assert len(out) == 4
    # forecast buckets continue the hourly axis
    assert [r["time_bucket"].hour for r in out] == [0, 1, 2, 3]
    for got, want in zip([r[-1] for r in out], exp):
        assert abs(got - want) < 1e-2  # NM converges to ~1e-4 here

    lin = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1) + dt.timedelta(hours=t), 5.0 + 2.0 * t)
            for t in range(10)
        ],
        ["time", "v"],
    )
    out = translate(
        lin, "SELECT holt_winters(mean(v), 3, 0) FROM lin GROUP BY time(1h)"
    ).collect()
    for got, want in zip([r[-1] for r in out], [25.0, 27.0, 29.0]):
        assert abs(got - want) < 1e-2


def test_holt_winters_with_fit_and_short_series(spark):
    from ciws_server_spark.plans.influxql import translate

    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(hours=t), float(t))
        for t in range(6)
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    out = translate(
        m,
        "SELECT holt_winters_with_fit(mean(v), 2, 0) FROM m GROUP BY time(1h)",
    ).collect()
    # 5 one-step fitted points (past the 1-point init) + 2 forecasts
    assert len(out) == 7
    for got, want in zip([r[-1] for r in out[-2:]], [6.0, 7.0]):
        assert abs(got - want) < 1e-2

    short = spark.createDataFrame(rows[:1], ["time", "v"])
    assert (
        translate(
            short,
            "SELECT holt_winters(mean(v), 2, 0) FROM s GROUP BY time(1h)",
        ).count()
        == 0
    )


def test_ta_fold_edge_cases(spark):
    """Flat and short series: RSI pegs at 100 when losses are 0 (Wilder
    convention), DEMA/TEMA reduce to the constant, TRIX is 0, and a
    series shorter than the warmup emits nothing."""
    from ciws_server_spark.plans.influxql import translate

    flat = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), 5.0)
            for i in range(6)
        ],
        ["time", "v"],
    )
    assert [
        r[-1]
        for r in translate(
            flat, "SELECT relative_strength_index(v, 2) FROM flat"
        ).collect()
    ] == [100.0, 100.0, 100.0, 100.0]
    assert [
        r[-1]
        for r in translate(
            flat, "SELECT double_exponential_moving_average(v, 2) FROM f"
        ).collect()
    ] == [5.0] * 5
    assert [
        r[-1]
        for r in translate(
            flat, "SELECT triple_exponential_derivative(v, 2) FROM f"
        ).collect()
    ] == [0.0] * 4
    short = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 1.0), (dt.datetime(2024, 1, 2), 2.0)],
        ["time", "v"],
    )
    assert (
        translate(
            short, "SELECT relative_strength_index(v, 4) FROM s"
        ).count()
        == 0
    )
    assert (
        translate(
            short, "SELECT chande_momentum_oscillator(v, 4) FROM s"
        ).count()
        == 0
    )


def test_show_series(spark, flow):
    """SHOW SERIES: distinct measurement,tag=value keys; LIMIT caps;
    null tags drop their pair; unknown measurement raises."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    t = {"flow": flow}
    got = [r["key"] for r in query_measurement(spark, t, "SHOW SERIES").collect()]
    assert got == ["flow,buildingID=A", "flow,buildingID=B"]
    got = [
        r["key"]
        for r in query_measurement(
            spark, t, "SHOW SERIES FROM flow LIMIT 1"
        ).collect()
    ]
    assert got == ["flow,buildingID=A"]

    null_tag = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), None, 1.0)],
        "time timestamp, buildingID string, v double",
    )
    got = [
        r["key"]
        for r in query_measurement(
            spark, {"m": null_tag}, "SHOW SERIES"
        ).collect()
    ]
    assert got == ["m"]

    with pytest.raises(InfluxQLError, match="unknown measurement"):
        query_measurement(spark, t, "SHOW SERIES FROM nope")


def test_ta_fold_composes_with_fill(spark):
    """TA folds run over the fill()-densified bucket axis (fill-first,
    as InfluxQL composes): a gap filled with previous makes the RSI
    see a flat step instead of skipping the bucket."""
    from ciws_server_spark.plans.influxql import translate

    rows = [
        (dt.datetime(2024, 1, 1, h), float(v))
        for h, v in [(0, 1), (1, 2), (2, 4), (4, 8), (5, 9)]  # hour 3 missing
    ]
    m = spark.createDataFrame(rows, ["time", "v"])
    out = translate(
        m,
        "SELECT relative_strength_index(last(v), 2) FROM m "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 05:00:00' "
        "GROUP BY time(1h) fill(previous)",
    ).collect()
    # densified axis has 6 buckets (hour 3 = LOCF 4.0) → RSI over
    # gains [1,2,0,4,1]: emitted from the 3rd bucket on
    assert len(out) == 4
    assert [r["time_bucket"].hour for r in out] == [2, 3, 4, 5]
    # hour-3 bucket: filled flat step → losses stay 0 → RSI pegs at 100
    assert out[1][-1] == 100.0


def test_show_keys_without_from_spans_all_measurements(spark, flow):
    from ciws_server_spark.plans.influxql import query_measurement

    other = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "s1", 3)],
        "time timestamp, siteID string, pulses bigint",
    )
    t = {"flow": flow, "pulse": other}
    tags = {
        r["tagKey"]
        for r in query_measurement(spark, t, "SHOW TAG KEYS").collect()
    }
    assert tags == {"buildingID", "siteID"}
    fields = {
        (r["fieldKey"], r["fieldType"])
        for r in query_measurement(spark, t, "SHOW FIELD KEYS").collect()
    }
    assert fields == {
        ("hotOutFlowRate", "float"),
        ("coldInFlowRate", "float"),
        ("pulses", "integer"),
    }


def test_selector_companion_columns(spark, flow):
    """SELECT max(f), tag — a selector carries companion columns from
    THE selected point (InfluxQL 1.x selector semantics; upstream
    errors only for non-selector aggregates like mean)."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    t = {"flow": flow}
    # ungrouped: the point's own timestamp comes back
    got = query_measurement(
        spark, t, "SELECT max(coldInFlowRate), buildingID FROM flow"
    ).collect()
    assert len(got) == 1
    r = got[0]
    # coldInFlowRate = i (0..119) per building; max 119 at minute 119
    # for both buildings — tie resolves to building A's point only by
    # time: both share minute 119, value 119.0. Earlier-insertion is
    # not a contract; assert the value/time and that a building came.
    assert r["max"] == 119.0 and r["time"].minute == 59
    assert r["buildingID"] in ("A", "B")

    # grouped by series: per-building selected point + companion
    got = query_measurement(
        spark, t,
        "SELECT first(coldInFlowRate), hotOutFlowRate FROM flow "
        "GROUP BY buildingID",
    ).collect()
    assert sorted(
        (r["buildingID"], r["first"], r["hotOutFlowRate"], r["time"].minute)
        for r in got
    ) == [("A", 0.0, 0.0, 0), ("B", 0.0, 0.0, 0)]

    # bucketed: bucket start replaces the point time
    got = query_measurement(
        spark, t,
        "SELECT max(hotOutFlowRate), coldInFlowRate FROM flow "
        "WHERE buildingID = 'A' GROUP BY time(1h)",
    ).collect()
    # hotOutFlowRate = i%7, max 6.0 first reached at i=6 in hour 0
    # and i=62 in hour 1 (ties → earlier time); companion = i
    assert sorted(
        (str(r["time_bucket"]), r["max"], r["coldInFlowRate"])
        for r in got
    ) == [
        ("2021-03-01 00:00:00", 6.0, 6.0),
        ("2021-03-01 01:00:00", 6.0, 62.0),
    ]

    # non-selector aggregate + companion stays the named mix error
    with pytest.raises(InfluxQLError, match="cannot mix"):
        query_measurement(
            spark, t, "SELECT mean(coldInFlowRate), buildingID FROM flow"
        )

    # unknown companion identifiers evaluate as null, never raise
    got = query_measurement(
        spark, t, "SELECT last(coldInFlowRate), nosuch FROM flow"
    ).collect()
    assert got[0]["nosuch"] is None


def test_top_bottom_with_tag_argument(spark, flow):
    """top(f, tag, N): the extreme point per tag value, for the N tag
    values whose extreme is greatest — two stacked rank windows."""
    from ciws_server_spark.plans.influxql import query_measurement

    t = {"flow": flow}
    got = query_measurement(
        spark, t, "SELECT top(coldInFlowRate, buildingID, 2) FROM flow"
    ).collect()
    # both buildings' maxima (119.0 each), with point timestamps
    assert sorted((r["buildingID"], r["top"], r["time"].minute) for r in got) == [
        ("A", 119.0, 59),
        ("B", 119.0, 59),
    ]

    got = query_measurement(
        spark, t, "SELECT bottom(coldInFlowRate, buildingID, 1) FROM flow"
    ).collect()
    assert len(got) == 1 and got[0]["bottom"] == 0.0

    # bucketed: N per bucket
    got = query_measurement(
        spark, t,
        "SELECT top(coldInFlowRate, buildingID, 1) FROM flow "
        "GROUP BY time(1h)",
    ).collect()
    assert sorted((r["time"].minute, r["top"]) for r in got) == [
        (59, 59.0),
        (59, 119.0),
    ]


def test_percentile_companion_columns(spark, flow):
    """percentile(f, p), tag — percentile is a SELECTOR in InfluxQL
    1.x: the nearest-rank POINT's companions come along. Same 1-based
    floor(n*p/100 + 0.5) index as the plain percentile aggregate;
    equal values pick the earlier point's companions."""
    from ciws_server_spark.plans.influxql import query_measurement

    t = {"flow": flow}
    got = query_measurement(
        spark, t,
        "SELECT percentile(coldInFlowRate, 50), hotOutFlowRate "
        "FROM flow WHERE buildingID = 'A'",
    ).collect()
    # coldInFlowRate = 0..119 sorted; idx = floor(120*0.5+0.5) = 60
    # → value 59.0 (1-based), companion = 59 % 7
    assert len(got) == 1
    r = got[0]
    assert r["percentile"] == 59.0
    assert r["hotOutFlowRate"] == float(59 % 7)
    assert r["time"].minute == 59  # the point's own timestamp


def test_companion_selector_empty_selection_emits_no_row(spark, flow):
    """A selector that selects no point emits no row — the ungrouped
    global aggregate must not surface Spark's one all-null row, and a
    grouped percentile with an out-of-range nearest-rank index must
    drop that group (found by differential fuzz seed 313)."""
    from ciws_server_spark.plans.influxql import query_measurement

    t = {"flow": flow}
    got = query_measurement(
        spark, t,
        "SELECT last(coldInFlowRate), hotOutFlowRate FROM flow "
        "WHERE buildingID = 'A' AND buildingID = 'B'",
    ).collect()
    assert got == []

    # one point per bucket at p=10: idx = floor(1*0.1 + 0.5) = 0 →
    # out of range → no row for that bucket
    import datetime as dt

    one = spark.createDataFrame(
        [(dt.datetime(2021, 3, 1, 0, 30), 5.0, 1.0)],
        ["time", "v", "w"],
    )
    got = query_measurement(
        spark, {"flow": one},
        "SELECT percentile(v, 10), w FROM flow GROUP BY time(1h)",
    ).collect()
    assert got == []


def test_sample_selector_deterministic(spark, flow):
    """sample(f, N): N points per bucket/series in xxhash64(time)
    order — a REPRODUCIBLE sample (documented divergence from
    InfluxDB's nondeterministic reservoir)."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    t = {"flow": flow}
    a = query_measurement(
        spark, t,
        "SELECT sample(coldInFlowRate, 5) FROM flow "
        "WHERE buildingID = 'A'",
    ).collect()
    assert len(a) == 5
    assert {r["sample"] for r in a} <= set(float(i) for i in range(120))
    # reproducible: second run returns the identical points
    b = query_measurement(
        spark, t,
        "SELECT sample(coldInFlowRate, 5) FROM flow "
        "WHERE buildingID = 'A'",
    ).collect()
    assert sorted(r["time"] for r in a) == sorted(r["time"] for r in b)

    # per bucket: N per bucket, all points when the bucket is smaller
    got = query_measurement(
        spark, t,
        "SELECT sample(coldInFlowRate, 70) FROM flow "
        "WHERE buildingID = 'B' GROUP BY time(1h)",
    ).collect()
    assert len(got) == 120  # 60 + 60: both hour-buckets exhausted

    # sample takes no tag argument
    with pytest.raises(InfluxQLError, match="no tag argument"):
        query_measurement(
            spark, t,
            "SELECT sample(coldInFlowRate, buildingID, 2) FROM flow",
        )


def test_show_cardinality_family(spark, flow):
    """SHOW ... CARDINALITY variants: exact counts (no sketch
    registry; InfluxDB 1.x defaults to estimated with an EXACT
    variant — exact satisfies both), same single-count convention as
    SHOW SERIES CARDINALITY."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        run_influxql,
    )

    t = {"flow": flow}

    def one(stmt):
        rows = run_influxql(spark, t, stmt, table_dir=None).collect()
        assert len(rows) == 1
        return rows[0]["count"]

    assert one("SHOW MEASUREMENT CARDINALITY") == 1
    assert one("SHOW TAG KEY CARDINALITY") == 1  # buildingID
    assert one("SHOW FIELD KEY CARDINALITY FROM flow") == 2
    assert (
        one('SHOW TAG VALUES CARDINALITY WITH KEY = "buildingID"') == 2
    )  # A, B
    with pytest.raises(InfluxQLError, match="WITH KEY"):
        run_influxql(
            spark, t, "SHOW TAG VALUES CARDINALITY", table_dir=None
        )
    # unknown key, FROM-qualified or not → count 0, not an error
    # (InfluxDB 1.x parity; was a named error before r11)
    assert (
        one('SHOW TAG VALUES CARDINALITY FROM flow WITH KEY = "nope"') == 0
    )


def test_show_tag_values_no_from_spans_measurements(spark, flow):
    """SHOW TAG VALUES without FROM spans every measurement (r11 —
    was an 'unknown measurement' error), flattened-distinct like the
    module's no-FROM TAG KEYS convention."""
    from ciws_server_spark.plans.influxql import query_measurement

    other = flow.withColumnRenamed("buildingID", "site")
    got = query_measurement(
        spark, {"flow": flow, "other": other},
        "SHOW TAG VALUES WITH KEY =~ /./",
    ).collect()
    assert [(r["key"], r["value"]) for r in got] == [
        ("buildingID", "A"),
        ("buildingID", "B"),
        ("site", "A"),
        ("site", "B"),
    ]


def test_show_regex_from(spark, flow):
    """SHOW ... FROM /regex/ (r11): the FROM token of every SHOW
    statement accepts a measurement regex, matching none (empty
    result) to many (one group per measurement — upstream's shape,
    r12). Exact unknown names still raise; an empty or invalid regex
    is a named error."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    other = flow.withColumnRenamed("buildingID", "site")
    t = {"campus_flow": flow, "campus_daily": other}
    got = query_measurement(spark, t, "SHOW TAG KEYS FROM /^campus/")
    assert [(r["measurement"], r["tagKey"]) for r in got.collect()] == [
        ("campus_daily", "site"),
        ("campus_flow", "buildingID"),
    ]
    assert (
        query_measurement(spark, t, "SHOW TAG KEYS FROM /nomatch/").count()
        == 0
    )
    got = query_measurement(
        spark, t, "SHOW TAG VALUES FROM /daily$/ WITH KEY = site"
    ).collect()
    assert [(r["key"], r["value"]) for r in got] == [
        ("site", "A"),
        ("site", "B"),
    ]
    assert query_measurement(
        spark, t, "SHOW TAG KEY CARDINALITY FROM /^campus/"
    ).collect()[0]["count"] == 2
    with pytest.raises(InfluxQLError, match="empty regex"):
        query_measurement(spark, t, "SHOW TAG KEYS FROM //")
    with pytest.raises(InfluxQLError, match="invalid regex"):
        query_measurement(spark, t, "SHOW SERIES FROM /(/")


def test_show_measurements_filters(spark, flow):
    """SHOW MEASUREMENTS WITH MEASUREMENT =~ /re/ | = name, and
    LIMIT/OFFSET pagination (r11). An unknown exact name filters to an
    empty list — WITH MEASUREMENT filters the listing, it does not
    address a measurement."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    t = {"campus_flow": flow, "campus_daily": flow, "other": flow}
    def names(q):
        return [r["name"] for r in query_measurement(spark, t, q).collect()]

    assert names("SHOW MEASUREMENTS") == [
        "campus_daily", "campus_flow", "other",
    ]
    assert names("SHOW MEASUREMENTS WITH MEASUREMENT =~ /^campus/") == [
        "campus_daily", "campus_flow",
    ]
    assert names("SHOW MEASUREMENTS WITH MEASUREMENT = other") == ["other"]
    assert names("SHOW MEASUREMENTS WITH MEASUREMENT = nosuch") == []
    assert names("SHOW MEASUREMENTS LIMIT 1 OFFSET 1") == ["campus_flow"]
    with pytest.raises(InfluxQLError, match="invalid regex"):
        query_measurement(
            spark, t, "SHOW MEASUREMENTS WITH MEASUREMENT =~ /(/"
        )


def test_show_where_predicates(spark, flow):
    """WHERE on the scanning SHOW kinds (r11): SHOW SERIES / TAG
    VALUES [CARDINALITY] filter points before the distinct; the
    metadata-only kinds raise a named error."""
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        query_measurement,
    )

    t = {"flow": flow}
    got = query_measurement(
        spark, t, "SHOW SERIES FROM flow WHERE buildingID = 'A'"
    ).collect()
    assert [r["key"] for r in got] == ["flow,buildingID=A"]
    got = query_measurement(
        spark, t,
        "SHOW TAG VALUES FROM flow WITH KEY = buildingID "
        "WHERE buildingID != 'A'",
    ).collect()
    assert [(r["key"], r["value"]) for r in got] == [("buildingID", "B")]
    got = query_measurement(
        spark, t,
        "SHOW TAG VALUES CARDINALITY FROM flow WITH KEY = buildingID "
        "WHERE buildingID = 'A'",
    ).collect()
    assert got[0]["count"] == 1
    with pytest.raises(InfluxQLError, match="WHERE is not supported"):
        query_measurement(
            spark, t, "SHOW TAG KEYS FROM flow WHERE buildingID = 'A'"
        )


def test_show_key_listings_paginate(spark, flow):
    """SHOW TAG KEYS / FIELD KEYS / TAG VALUES honor LIMIT/OFFSET —
    applied WITHIN each measurement, as upstream documents (r12; the
    r11 form paged the flattened list)."""
    from ciws_server_spark.plans.influxql import query_measurement

    import pyspark.sql.functions as F

    two_tags = flow.withColumn("room", F.lit("R1"))
    t = {"flow": flow, "other": two_tags}
    # per-measurement paging: flow has ONE tag key, so OFFSET 1
    # exhausts it; other's second key (sorted) survives
    got = query_measurement(spark, t, "SHOW TAG KEYS LIMIT 1 OFFSET 1")
    assert [(r["measurement"], r["tagKey"]) for r in got.collect()] == [
        ("other", "room")
    ]
    got = query_measurement(spark, t, "SHOW TAG KEYS LIMIT 1")
    assert [(r["measurement"], r["tagKey"]) for r in got.collect()] == [
        ("flow", "buildingID"),
        ("other", "buildingID"),
    ]
    got = query_measurement(spark, t, "SHOW FIELD KEYS FROM flow LIMIT 2")
    assert got.count() == 2
    got = query_measurement(
        spark, t,
        "SHOW TAG VALUES FROM flow WITH KEY = buildingID LIMIT 1 OFFSET 1",
    ).collect()
    assert [(r["measurement"], r["key"], r["value"]) for r in got] == [
        ("flow", "buildingID", "B")
    ]


def test_type_mismatched_where_matches_nothing(spark, flow):
    """A type-conflicted WHERE predicate (numeric field vs word /
    boolean / string; boolean field vs non-boolean) compiles to a
    no-match condition, never an executor CAST_INVALID_INPUT (r11,
    found by probing — the fuzz only generated numeric rhs)."""
    from ciws_server_spark.plans.influxql import query_measurement

    t = {"flow": flow}
    for q in (
        "SELECT count(hotOutFlowRate) FROM flow WHERE hotOutFlowRate > true",
        "SELECT count(hotOutFlowRate) FROM flow WHERE hotOutFlowRate = 'word'",
        "SELECT count(hotOutFlowRate) FROM flow WHERE hotOutFlowRate != banana",
    ):
        assert query_measurement(spark, t, q).collect()[0][0] == 0
    # numeric literals (bare, quoted, integral) still compare
    n = query_measurement(
        spark, t,
        "SELECT count(hotOutFlowRate) FROM flow WHERE hotOutFlowRate >= 0",
    ).collect()[0][0]
    assert n > 0


def test_show_series_no_match_regex_is_empty(spark, flow):
    """SHOW SERIES [CARDINALITY] FROM /nomatch/ is an empty result /
    zero count, not an empty-reduce TypeError (fuzz-found, r11)."""
    from ciws_server_spark.plans.influxql import query_measurement

    t = {"flow": flow}
    assert query_measurement(
        spark, t, "SHOW SERIES FROM /nomatch/"
    ).count() == 0
    got = query_measurement(
        spark, t, "SHOW SERIES CARDINALITY FROM /nomatch/"
    ).collect()
    assert got[0]["count"] == 0


def test_function_named_fields_null_fill(spark, tmp_path):
    """Soak-found r14: a field may legally be NAMED count/min/sum/...;
    referencing one the measurement lacks must null-fill like any
    unknown field — the old scraper treated every grammar word as
    grammar, so ``min(count)`` on a count-less table leaked an
    unresolved-column AnalysisException through the wire."""
    import datetime as dt

    from ciws_server_spark.plans.influxql import translate

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 1.5)], "time timestamp, v double"
    )
    # absent function-named field inside a call: null aggregate
    rows = translate(df, "SELECT min(count) FROM m").collect()
    assert [tuple(r) for r in rows] == [(None,)]
    # quoted form is an identifier by definition
    rows = translate(df, 'SELECT max("sum") FROM m').collect()
    assert [tuple(r) for r in rows] == [(None,)]
    # bare projection of an absent function-named field
    rows = translate(df, "SELECT mean FROM m").collect()
    assert [tuple(r) for r in rows] == [(dt.datetime(2024, 1, 1), None)]
    # PRESENT function-named fields still resolve to their data
    df2 = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 3, 2.0)],
        "time timestamp, count long, min double",
    )
    rows = translate(df2, "SELECT min(count) FROM m").collect()
    assert [tuple(r) for r in rows] == [(3,)]
    rows = translate(df2, "SELECT max(min) FROM m").collect()
    assert [tuple(r) for r in rows] == [(2.0,)]
    # and real calls are untouched
    rows = translate(df2, "SELECT count(min) FROM m").collect()
    assert [tuple(r) for r in rows] == [(1,)]


def test_wire_analysis_exception_is_in_body_error(spark, tmp_path, monkeypatch):
    """Wire totality net (r14): if a translated plan still reaches an
    AnalysisException at execution, /query reports upstream's in-body
    statement error — never a raised exception / non-JSON response."""
    from pyspark.errors import AnalysisException

    from ciws_server_spark.sources import http_api as ha

    api = ha.InfluxHTTPApi(spark, str(tmp_path))

    def boom(*a, **k):
        raise AnalysisException("[UNRESOLVED_COLUMN] `x` cannot be resolved")

    monkeypatch.setattr(ha, "run_influxql", boom)
    status, body = api.handle_query({"q": "SELECT x FROM m"})
    assert status == 200
    (res,) = body["results"]
    assert "invalid statement" in res["error"]
    status, chunks = api.handle_query_chunked({"q": "SELECT x FROM m"})
    assert status == 200
    envs = list(chunks)
    assert any("invalid statement" in r.get("error", "")
               for env in envs for r in env["results"])
