"""Differential oracle fuzz: random InfluxQL statements vs DuckDB.

The fixed 129-query catalog pins known-good statements; the statement
fuzz (test_influxql_statement_fuzz) pins crash-freedom. This suite
closes the gap between them: it generates random statements from a
STRUCTURED AST (not text mutation), renders the same AST as (a)
InfluxQL for this engine and (b) ANSI SQL for DuckDB, executes both
on identical data, and compares row counts and values — randomized
correctness, not just totality.

Covered AST space: raw selects and single-aggregate selects with
tag/field/time WHERE trees (AND/OR/parens), GROUP BY time(N[, offset])
+tags (fill none), subqueries (outer agg over raw-aliased inner;
outer scalar agg over inner bucketed agg), selectors
(distinct/top/bottom), transforms (difference/cumulative_sum/
derivative/moving_average over bucketed aggregates; elapsed and
difference over raw per-series sequences), fill(0/null/previous),
percentile/median — over a fixture with nulls in both a field and a
tag. Aggregates restricted to the exactly-representable ones
(sum/count/min/max/mean over 2-dp-ish doubles at tiny row counts is
float-stable; stddev / percentile interpolation are pinned by the
catalog oracles instead). top/bottom fuzz uses the strictly-monotone
field (tempC) so rank order is tie-free and both engines agree
without modeling tie-break rules.

Engine semantics the oracles encode (probed, matching InfluxDB 1.x):
raw transforms without GROUP BY <tag> merge all points into ONE
sequence; elapsed truncates (integer division by the unit);
moving_average runs over the null-skipped bucket sequence and emits
from the Nth value; distinct() drops null field values; offset
buckets are floor((epoch-off)/width)*width+off.
"""

from __future__ import annotations

import datetime as dt
import math
import random

import duckdb
import pandas as pd
import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ciws_server_spark.plans.influxql import query_measurement

BASE = dt.datetime(2024, 1, 1, 6, 0)


def _rows():
    rows = []
    for i in range(60):
        rows.append(
            (
                BASE + dt.timedelta(minutes=7 * i),
                None if i % 11 == 7 else ("A", "B", "C")[i % 3],
                None if i % 5 == 2 else float(i % 13) + 0.25,
                float(i) * 0.5 - 3.0,
            )
        )
    return rows


def _rows_daily():
    """Months-spanning daily series (calendar-bucket fuzz needs more
    than one month/quarter/year boundary in range); nulls in both
    the field and the tag, like the minute fixture."""
    base = dt.datetime(2023, 11, 15)
    rows = []
    for i in range(300):
        rows.append(
            (
                base + dt.timedelta(days=i, hours=i % 5),
                None if i % 11 == 7 else ("A", "B")[i % 2],
                None if i % 7 == 3 else float(i % 13) + 0.25,
            )
        )
    return rows


@pytest.fixture(scope="module")
def fixture(spark):
    pdf = pd.DataFrame(
        _rows(), columns=["time", "buildingID", "flowRate", "tempC"]
    )
    df = spark.createDataFrame(
        _rows(),
        "time timestamp, buildingID string, flowRate double, tempC double",
    )
    dpdf = pd.DataFrame(
        _rows_daily(), columns=["time", "buildingID", "flowRate"]
    )
    ddf = spark.createDataFrame(
        _rows_daily(),
        "time timestamp, buildingID string, flowRate double",
    )
    con = duckdb.connect()
    con.register("campus_flow", pdf)
    con.register("campus_daily", dpdf)
    return {
        "tables": {"campus_flow": df, "campus_daily": ddf},
        "con": con,
    }


# ------------------------------------------------------------- AST gen

AGGS = {
    "mean": "AVG",
    "sum": "SUM",
    "count": "COUNT",
    "min": "MIN",
    "max": "MAX",
}
FIELDS = ["flowRate", "tempC"]


def _agg_sql(fn: str, f: str) -> str:
    """DuckDB rendering of one InfluxQL aggregate over field f.

    first/last are InfluxDB point semantics: the value of the
    earliest/latest point THAT HAS the field — null field values are
    not points, so they are skipped, not returned."""
    if fn == "first":
        return f"arg_min({f}, CASE WHEN {f} IS NOT NULL THEN time END)"
    if fn == "last":
        return f"arg_max({f}, CASE WHEN {f} IS NOT NULL THEN time END)"
    if fn == "spread":
        return f"MAX({f}) - MIN({f})"
    return f"{AGGS[fn]}({f})"


EXTRA_AGGS = ["first", "last", "spread"]


def _gen_atom(r: random.Random):
    kind = r.randrange(4)
    if kind == 0:
        v = r.choice(["A", "B", "C", "Z"])
        op = r.choice(["=", "!="])
        # engine semantics: comparisons are null-rejecting both
        # sides (Spark three-valued logic, mirrored in SQL)
        return (
            f"buildingID {op} '{v}'",
            f"buildingID {'=' if op == '=' else '<>'} '{v}'",
        )
    if kind == 1:
        lo = BASE + dt.timedelta(minutes=r.randrange(0, 400))
        op = r.choice([">=", "<", ">", "<="])
        return (
            f"time {op} '{lo:%Y-%m-%d %H:%M:%S}'",
            f"time {op} TIMESTAMP '{lo:%Y-%m-%d %H:%M:%S}'",
        )
    if kind == 2:
        f = r.choice(FIELDS)
        thresh = round(r.uniform(-3, 12), 2)
        op = r.choice([">", "<", ">=", "<="])
        return f"{f} {op} {thresh}", f"{f} {op} {thresh}"
    pat = r.choice(["^[AB]$", "A|C", "^B"])
    op = r.choice(["=~", "!~"])
    m = f"regexp_matches(buildingID, '{pat}')"
    return (
        f"buildingID {op} /{pat}/",
        m if op == "=~" else f"NOT {m}",
    )


def gen_where(r: random.Random, allow_or: bool = True):
    """Random boolean tree of 0-3 atoms (AND/OR, parenthesized
    sub-groups); returns (influxql, sql) rendered identically —
    three-valued NULL logic matches between the engines so the same
    tree is the oracle."""
    n = r.randrange(4)
    if n == 0:
        return "", ""
    parts = [_gen_atom(r) for _ in range(n)]
    iql, sql = parts[0]
    for a_iql, a_sql in parts[1:]:
        op = "OR" if allow_or and r.random() < 0.4 else "AND"
        if op == "OR" and r.random() < 0.5:
            iql = f"({iql}) OR {a_iql}"
            sql = f"({sql}) OR {a_sql}"
        else:
            iql = f"{iql} {op} ({a_iql})"
            sql = f"{sql} {op} ({a_sql})"
    return iql, sql


def gen_fill_case(r: random.Random):
    """Closed-time-range GROUP BY time(N) with fill(): the dense-axis
    surface — per-series bucket axis spanning the WHERE range, empty
    buckets filled with 0 / null / LOCF."""
    fn = r.choice(["count", "sum", "max", "first", "last"])
    f = r.choice(FIELDS)
    alias = f"{fn}_{f}"
    bucket_min = r.choice([30, 60, 120])
    bsec = bucket_min * 60
    fill = r.choice(["0", "null", "previous"])
    tags = ["buildingID"] if r.random() < 0.5 else []
    lo = BASE + dt.timedelta(minutes=r.randrange(0, 120))
    hi = lo + dt.timedelta(minutes=r.randrange(90, 360))
    group_iql = [f"time({bucket_min}m)"] + tags
    iql = (
        f"SELECT {fn}({f}) FROM campus_flow "
        f"WHERE time >= '{lo:%Y-%m-%d %H:%M:%S}' "
        f"AND time <= '{hi:%Y-%m-%d %H:%M:%S}' "
        f"GROUP BY {', '.join(group_iql)} fill({fill})"
    )
    bucket_sql = (
        f"to_timestamp(CAST(floor(epoch(time) / {bsec}) AS BIGINT) "
        f"* {bsec})"
    )
    agg_sql = _agg_sql(fn, f)
    tag_sel = (", " + ", ".join(tags)) if tags else ""
    tag_x = (", " + ", ".join(f"x.{t}" for t in tags)) if tags else ""
    series = (
        f"(SELECT DISTINCT {', '.join(tags)} FROM agg) s,"
        if tags
        else ""
    )
    join_tags = "".join(
        f" AND a.{t} IS NOT DISTINCT FROM x.{t}" for t in tags
    )
    if fill == "previous":
        part = (
            f"PARTITION BY {', '.join('x.' + t for t in tags)} "
            if tags
            else ""
        )
        val = (
            f"last_value(a.{alias} IGNORE NULLS) OVER "
            f"({part}ORDER BY x.time_bucket) AS {alias}"
        )
    elif fill == "0":
        val = f"COALESCE(a.{alias}, 0) AS {alias}"
    else:
        val = f"a.{alias} AS {alias}"
    sql = f"""
        WITH filt AS (
          SELECT * FROM campus_flow
          WHERE time >= TIMESTAMP '{lo:%Y-%m-%d %H:%M:%S}'
            AND time <= TIMESTAMP '{hi:%Y-%m-%d %H:%M:%S}'
        ),
        agg AS (
          SELECT {bucket_sql} AS time_bucket, {agg_sql} AS {alias}
                 {tag_sel}
          FROM filt GROUP BY {', '.join(['1'] + ['3'] * bool(tags))}
        ),
        axis AS (
          SELECT {("s." + ", s.".join(tags) + ", ") if tags else ""}
                 b.time_bucket
          FROM {series}
               (SELECT unnest(generate_series(
                  to_timestamp(CAST(floor(epoch(TIMESTAMP
                    '{lo:%Y-%m-%d %H:%M:%S}') / {bsec}) AS BIGINT)
                    * {bsec}),
                  to_timestamp(CAST(floor(epoch(TIMESTAMP
                    '{hi:%Y-%m-%d %H:%M:%S}') / {bsec}) AS BIGINT)
                    * {bsec}),
                  INTERVAL {bucket_min} MINUTE)) AS time_bucket) b
        )
        SELECT x.time_bucket{tag_x}, {val}
        FROM axis x LEFT JOIN agg a
          ON a.time_bucket = x.time_bucket{join_tags}
    """
    return iql, sql, "fill"


ZONES = ["America/Chicago", "Asia/Kolkata", "Europe/Berlin", "UTC"]


def gen_tz_fill_case(r: random.Random):
    """tz() + fill() (r11): the dense axis must sit on the LOCAL
    wall-clock grid and convert back to UTC instants. Two shapes:
    sub-day buckets over the January minute fixture (constant zone
    offsets, including Kolkata's half-hour), and time(1d) over the
    months-spanning daily fixture, whose range crosses the 2024
    US/EU spring-forward transitions. Local midnights always exist
    (transitions happen 2-3am), so the Spark and ICU conventions for
    nonexistent local times never get a chance to diverge."""
    z = r.choice(ZONES)
    fill = r.choice(["0", "null", "previous"])
    tags = ["buildingID"] if r.random() < 0.5 else []
    calendar = False
    if r.random() < 0.5:
        table, f = "campus_daily", "flowRate"
        if r.random() < 0.4:
            # calendar months in LOCAL time: date_trunc on the shifted
            # wall clock, axis steps whole months on month starts
            calendar = True
            bsec, step_sql, bspec = None, "INTERVAL 1 MONTH", "1mo"
        else:
            bsec, step_sql, bspec = 86400, "INTERVAL 1 DAY", "1d"
        base = dt.datetime(2023, 11, 15)
        lo = base + dt.timedelta(days=r.randrange(0, 60))
        hi = lo + dt.timedelta(days=r.randrange(30, 200))
    else:
        table, f = "campus_flow", r.choice(FIELDS)
        bucket_min = r.choice([30, 60, 120])
        bsec = bucket_min * 60
        step_sql, bspec = f"INTERVAL {bucket_min} MINUTE", f"{bucket_min}m"
        lo = BASE + dt.timedelta(minutes=r.randrange(0, 120))
        hi = lo + dt.timedelta(minutes=r.randrange(90, 360))
    fn = r.choice(["count", "sum", "max", "first", "last"])
    alias = f"{fn}_{f}"

    def to_utc(naive: str) -> str:
        return f"(({naive} AT TIME ZONE '{z}') AT TIME ZONE 'UTC')"

    def floor_naive(naive: str) -> str:
        if calendar:
            return f"date_trunc('month', {naive})"
        # to_timestamp returns TIMESTAMPTZ; AT TIME ZONE 'UTC' lands
        # back on the naive wall-clock value epoch() read
        return (
            f"(to_timestamp(CAST(floor(epoch({naive}) / {bsec}) AS "
            f"BIGINT) * {bsec}) AT TIME ZONE 'UTC')"
        )

    loc_time = f"((time AT TIME ZONE 'UTC') AT TIME ZONE '{z}')"
    bucket_sql = to_utc(floor_naive(loc_time))
    lo_s, hi_s = f"{lo:%Y-%m-%d %H:%M:%S}", f"{hi:%Y-%m-%d %H:%M:%S}"
    group_iql = [f"time({bspec})"] + tags
    iql = (
        f"SELECT {fn}({f}) FROM {table} "
        f"WHERE time >= '{lo_s}' AND time <= '{hi_s}' "
        f"GROUP BY {', '.join(group_iql)} fill({fill}) tz('{z}')"
    )
    agg_sql = _agg_sql(fn, f)
    tag_sel = (", " + ", ".join(tags)) if tags else ""
    tag_x = (", " + ", ".join(f"x.{t}" for t in tags)) if tags else ""
    series = (
        f"(SELECT DISTINCT {', '.join(tags)} FROM agg) s,"
        if tags
        else ""
    )
    join_tags = "".join(
        f" AND a.{t} IS NOT DISTINCT FROM x.{t}" for t in tags
    )
    if fill == "previous":
        part = (
            f"PARTITION BY {', '.join('x.' + t for t in tags)} "
            if tags
            else ""
        )
        val = (
            f"last_value(a.{alias} IGNORE NULLS) OVER "
            f"({part}ORDER BY x.time_bucket) AS {alias}"
        )
    elif fill == "0":
        val = f"COALESCE(a.{alias}, 0) AS {alias}"
    else:
        val = f"a.{alias} AS {alias}"
    sql = f"""
        WITH filt AS (
          SELECT * FROM {table}
          WHERE time >= {to_utc(f"TIMESTAMP '{lo_s}'")}
            AND time <= {to_utc(f"TIMESTAMP '{hi_s}'")}
        ),
        agg AS (
          SELECT {bucket_sql} AS time_bucket, {agg_sql} AS {alias}
                 {tag_sel}
          FROM filt GROUP BY {', '.join(['1'] + ['3'] * bool(tags))}
        ),
        axis AS (
          SELECT {("s." + ", s.".join(tags) + ", ") if tags else ""}
                 {to_utc("b.lb")} AS time_bucket
          FROM {series}
               (SELECT unnest(generate_series(
                  {floor_naive(f"TIMESTAMP '{lo_s}'")},
                  {floor_naive(f"TIMESTAMP '{hi_s}'")},
                  {step_sql})) AS lb) b
        )
        SELECT x.time_bucket{tag_x}, {val}
        FROM axis x LEFT JOIN agg a
          ON a.time_bucket = x.time_bucket{join_tags}
    """
    # eligible cases always take the transform composition: the plain
    # tz_fill shape is already covered by the 0/null/previous fills,
    # and a 0.35 conditional draw left the diff path at ~1 case per
    # 1,000 in the evidence runs
    if fill == "0" and fn in ("count", "sum", "max"):
        # transform-over-filled-series composition: difference() runs
        # AFTER fill (InfluxQL fill-first order); the leading axis
        # bucket has no lag and is skipped (null transform values are
        # not points)
        iql = iql.replace(f"SELECT {fn}({f})", f"SELECT difference({fn}({f}))")
        part = (
            "PARTITION BY " + ", ".join(tags) + " " if tags else ""
        )
        tag_cols = (", " + ", ".join(tags)) if tags else ""
        sql = f"""
            WITH dense AS ({sql})
            SELECT time_bucket{tag_cols},
                   CAST(v - prev AS DOUBLE) AS difference
            FROM (
              SELECT time_bucket{tag_cols}, {alias} AS v,
                     lag({alias}) OVER ({part}ORDER BY time_bucket) AS prev
              FROM dense)
            WHERE prev IS NOT NULL
        """
        return iql, sql, "tz_fill_diff"
    return iql, sql, "tz_fill"


def gen_transform_case(r: random.Random):
    """difference / cumulative_sum over a bucketed aggregate, and
    mean-arithmetic select items — per-series window semantics."""
    f = r.choice(FIELDS)
    bucket_min = r.choice([30, 60, 120])
    bsec = bucket_min * 60
    tags = ["buildingID"] if r.random() < 0.5 else []
    lo = BASE + dt.timedelta(minutes=r.randrange(0, 90))
    hi = lo + dt.timedelta(minutes=r.randrange(120, 360))
    where_iql = (
        f"time >= '{lo:%Y-%m-%d %H:%M:%S}' "
        f"AND time <= '{hi:%Y-%m-%d %H:%M:%S}'"
    )
    where_sql = (
        f"time >= TIMESTAMP '{lo:%Y-%m-%d %H:%M:%S}' "
        f"AND time <= TIMESTAMP '{hi:%Y-%m-%d %H:%M:%S}'"
    )
    bucket_sql = (
        f"to_timestamp(CAST(floor(epoch(time) / {bsec}) AS BIGINT) "
        f"* {bsec})"
    )
    group_iql = [f"time({bucket_min}m)"] + tags
    part = f"PARTITION BY {', '.join(tags)} " if tags else ""
    tag_sel = (", " + ", ".join(tags)) if tags else ""
    group_cols = ", ".join(["1"] + (["3"] if tags else []))
    kind = r.choice(
        [
            "difference",
            "cumulative_sum",
            "arith",
            "derivative",
            "moving_average",
        ]
    )
    if kind == "arith":
        # mean(a) <op> mean(b) — selection-exact ops only (+/-)
        op = r.choice(["+", "-"])
        iql = (
            f"SELECT mean(flowRate) {op} mean(tempC) AS combo "
            f"FROM campus_flow WHERE {where_iql} "
            f"GROUP BY {', '.join(group_iql)}"
        )
        sql = (
            f"SELECT {bucket_sql} AS time_bucket, "
            f"AVG(flowRate) {op} AVG(tempC) AS combo{tag_sel} "
            f"FROM campus_flow WHERE {where_sql} "
            f"GROUP BY {group_cols}"
        )
        return iql, sql, "agg"
    agg_fn = r.choice(["count", "sum"])
    alias = f"{agg_fn}_{f}"
    iql = (
        f"SELECT {kind}({agg_fn}({f})) FROM campus_flow "
        f"WHERE {where_iql} GROUP BY {', '.join(group_iql)}"
    )
    inner = (
        f"SELECT {bucket_sql} AS time_bucket, "
        f"{_agg_sql(agg_fn, f)} AS v{tag_sel} "
        f"FROM campus_flow WHERE {where_sql} GROUP BY {group_cols}"
    )
    # InfluxQL transforms SKIP null bucket values (a bucket whose
    # aggregate is null — e.g. sum over all-null field rows —
    # produces no transform point and is not a difference operand)
    if kind == "derivative":
        unit_iql, unit_sec = r.choice([("1m", 60), ("1h", 3600)])
        iql = (
            f"SELECT derivative({agg_fn}({f}), {unit_iql}) "
            f"FROM campus_flow WHERE {where_iql} "
            f"GROUP BY {', '.join(group_iql)}"
        )
        sql = f"""
            WITH agg AS ({inner}),
            lagged AS (
              SELECT time_bucket{tag_sel},
                     CAST(v AS DOUBLE) AS v,
                     LAG(CAST(v AS DOUBLE)) OVER w AS pv,
                     epoch(time_bucket) - LAG(epoch(time_bucket))
                       OVER w AS dt
              FROM agg WHERE v IS NOT NULL
              WINDOW w AS ({part}ORDER BY time_bucket)
            )
            SELECT time_bucket{tag_sel},
                   (v - pv) / dt * {unit_sec}.0 AS derivative
            FROM lagged WHERE pv IS NOT NULL AND dt > 0
        """
        return iql, sql, "transform"
    if kind == "moving_average":
        n = r.choice([2, 3, 4])
        iql = (
            f"SELECT moving_average({agg_fn}({f}), {n}) "
            f"FROM campus_flow WHERE {where_iql} "
            f"GROUP BY {', '.join(group_iql)}"
        )
        # runs over the null-skipped bucket sequence; emits from the
        # n-th non-null value (window must be full)
        win = f"{part}ORDER BY time_bucket"
        sql = f"""
            WITH agg AS ({inner}),
            win AS (
              SELECT time_bucket{tag_sel},
                     ROW_NUMBER() OVER ({win}) AS rn,
                     AVG(CAST(v AS DOUBLE)) OVER
                       ({win} ROWS BETWEEN {n - 1} PRECEDING
                        AND CURRENT ROW) AS ma
              FROM agg WHERE v IS NOT NULL
            )
            SELECT time_bucket{tag_sel}, ma AS moving_average
            FROM win WHERE rn >= {n}
        """
        return iql, sql, "transform"
    if kind == "difference":
        sql = f"""
            WITH agg AS ({inner}),
            lagged AS (
              SELECT time_bucket{tag_sel},
                     CAST(v AS DOUBLE) AS v,
                     LAG(CAST(v AS DOUBLE)) OVER
                       ({part}ORDER BY time_bucket) AS pv
              FROM agg WHERE v IS NOT NULL
            )
            SELECT time_bucket{tag_sel}, v - pv AS difference
            FROM lagged WHERE pv IS NOT NULL
        """
    else:
        sql = f"""
            WITH agg AS ({inner})
            SELECT time_bucket{tag_sel},
                   SUM(CAST(v AS DOUBLE)) OVER
                     ({part}ORDER BY time_bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cumulative_sum
            FROM agg WHERE v IS NOT NULL
        """
    return iql, sql, "transform"


def gen_rank_case(r: random.Random):
    """percentile (nearest-rank) / median, and ORDER BY+LIMIT raw
    selects (timestamps unique per series → deterministic)."""
    f = r.choice(FIELDS)
    kind = r.choice(["percentile", "median", "order_limit"])
    if kind == "order_limit":
        n = r.choice([1, 5, 17])
        desc = r.random() < 0.5
        iql = (
            f"SELECT {f} FROM campus_flow "
            f"ORDER BY time {'DESC' if desc else 'ASC'} LIMIT {n}"
        )
        sql = (
            f"SELECT time, {f} FROM campus_flow "
            f"ORDER BY time {'DESC' if desc else 'ASC'} LIMIT {n}"
        )
        return iql, sql, "raw"
    bucket_min = r.choice([60, 120])
    bsec = bucket_min * 60
    tags = ["buildingID"] if r.random() < 0.5 else []
    bucket_sql = (
        f"to_timestamp(CAST(floor(epoch(time) / {bsec}) AS BIGINT) "
        f"* {bsec})"
    )
    tag_sel = (", " + ", ".join(tags)) if tags else ""
    group_cols = ", ".join(["1"] + (["3"] if tags else []))
    group_iql = [f"time({bucket_min}m)"] + tags
    lst = f"list_sort(list({f}) FILTER (WHERE {f} IS NOT NULL))"
    if kind == "percentile":
        pct = r.choice([10, 50, 90, 95, 100])
        alias = f"percentile_{f}"
        iql = (
            f"SELECT percentile({f}, {pct}) FROM campus_flow "
            f"GROUP BY {', '.join(group_iql)}"
        )
        # InfluxQL nearest-rank: 1-based floor(n*p/100 + 0.5);
        # out-of-range index → null (DuckDB list extract obliges)
        idx = (
            f"CAST(floor(len({lst}) * {pct} / 100.0 + 0.5) AS BIGINT)"
        )
        val = f"CASE WHEN {idx} >= 1 THEN {lst}[{idx}] END"
    else:
        alias = f"median_{f}"
        iql = (
            f"SELECT median({f}) FROM campus_flow "
            f"GROUP BY {', '.join(group_iql)}"
        )
        # middle value; even count → mean of the two middles
        val = (
            f"CASE WHEN len({lst}) = 0 THEN NULL "
            f"WHEN len({lst}) % 2 = 1 "
            f"THEN {lst}[(len({lst}) + 1) // 2] "
            f"ELSE ({lst}[len({lst}) // 2] "
            f"+ {lst}[len({lst}) // 2 + 1]) / 2.0 END"
        )
    sql = (
        f"SELECT {bucket_sql} AS time_bucket, {val} AS {alias}"
        f"{tag_sel} FROM campus_flow GROUP BY {group_cols}"
    )
    return iql, sql, "agg"


def gen_raw_transform_case(r: random.Random):
    """elapsed / difference over the RAW point sequence: without
    GROUP BY <tag> all points merge into one sequence; with it the
    transform runs per-series (null tag = its own series)."""
    kind = r.choice(["elapsed", "difference"])
    f = r.choice(FIELDS)
    per_series = r.random() < 0.5
    where_iql, where_sql = gen_where(r, allow_or=False)
    w_iql = f" WHERE {where_iql}" if where_iql else ""
    w_and = f" AND ({where_sql})" if where_sql else ""
    group = " GROUP BY buildingID" if per_series else ""
    tag_sel = ", buildingID" if per_series else ""
    part = "PARTITION BY buildingID " if per_series else ""
    if kind == "elapsed":
        unit_iql, unit_sec = r.choice([("1m", 60), ("1h", 3600)])
        iql = (
            f"SELECT elapsed({f}, {unit_iql}) FROM campus_flow"
            f"{w_iql}{group}"
        )
        # truncating integer division of the point-to-point gap
        val = (
            f"CAST(floor((epoch(time) - LAG(epoch(time)) OVER "
            f"({part}ORDER BY time)) / {unit_sec}) AS BIGINT)"
        )
        alias = "elapsed"
    else:
        iql = (
            f"SELECT difference({f}) FROM campus_flow{w_iql}{group}"
        )
        val = f"{f} - LAG({f}) OVER ({part}ORDER BY time)"
        alias = "difference"
    sql = f"""
        WITH nn AS (
          SELECT * FROM campus_flow
          WHERE {f} IS NOT NULL{w_and}
        ),
        d AS (SELECT time{tag_sel}, {val} AS {alias} FROM nn)
        SELECT time{tag_sel}, {alias} FROM d
        WHERE {alias} IS NOT NULL
    """
    return iql, sql, "transform"


def gen_subquery_case(r: random.Random):
    """InfluxQL subqueries, both exercised shapes: an outer bucketed
    aggregate over a raw-aliased inner select, and an outer scalar
    aggregate over an inner bucketed aggregate."""
    f = r.choice(FIELDS)
    if r.random() < 0.5:
        # outer agg over inner raw alias
        fn = r.choice(sorted(AGGS))
        where_iql, where_sql = gen_where(r, allow_or=False)
        wi_iql = f" WHERE {where_iql}" if where_iql else ""
        wi_sql = f" WHERE {where_sql}" if where_sql else ""
        thresh = round(r.uniform(-2, 10), 2)
        outer_w = r.random() < 0.5
        wo_iql = f" WHERE x > {thresh}" if outer_w else ""
        wo_sql = f" WHERE x > {thresh}" if outer_w else ""
        bucket_min = r.choice([30, 60, 120])
        bsec = bucket_min * 60
        iql = (
            f"SELECT {fn}(x) FROM "
            f"(SELECT {f} AS x FROM campus_flow{wi_iql})"
            f"{wo_iql} GROUP BY time({bucket_min}m)"
        )
        bucket_sql = (
            f"to_timestamp(CAST(floor(epoch(time) / {bsec}) "
            f"AS BIGINT) * {bsec})"
        )
        sql = (
            f"SELECT {bucket_sql} AS time_bucket, "
            f"{_agg_sql(fn, 'x')} AS {fn}_x FROM "
            f"(SELECT time, {f} AS x FROM campus_flow{wi_sql}) "
            f"{wo_sql} GROUP BY 1"
        )
        return iql, sql, "agg"
    # outer scalar agg over inner bucketed agg
    fn1 = r.choice(["mean", "sum", "count", "max"])
    fn2 = r.choice(["max", "min", "mean", "count", "sum"])
    bucket_min = r.choice([30, 60])
    bsec = bucket_min * 60
    where_iql, where_sql = gen_where(r, allow_or=False)
    wi_iql = f" WHERE {where_iql}" if where_iql else ""
    wi_sql = f" WHERE {where_sql}" if where_sql else ""
    iql = (
        f"SELECT {fn2}(m) FROM "
        f"(SELECT {fn1}({f}) AS m FROM campus_flow{wi_iql} "
        f"GROUP BY time({bucket_min}m))"
    )
    bucket_sql = (
        f"to_timestamp(CAST(floor(epoch(time) / {bsec}) AS BIGINT) "
        f"* {bsec})"
    )
    sql = (
        f"SELECT {_agg_sql(fn2, 'm')} AS {fn2}_m FROM "
        f"(SELECT {bucket_sql} AS tb, {_agg_sql(fn1, f)} AS m "
        f"FROM campus_flow{wi_sql} GROUP BY 1)"
    )
    return iql, sql, "agg"


def gen_selector_case(r: random.Random):
    """distinct / top / bottom selectors. top/bottom use tempC (a
    strictly-monotone field) so ranks are tie-free and both engines
    agree without modeling InfluxDB tie-break rules."""
    kind = r.choice(
        ["distinct", "top", "bottom", "companion", "top_tag"]
    )
    where_iql, where_sql = gen_where(r, allow_or=False)
    w_iql = f" WHERE {where_iql}" if where_iql else ""
    if kind == "companion":
        return _gen_companion(r, where_iql, where_sql)
    if kind == "top_tag":
        return _gen_top_tag(r, where_iql, where_sql)
    if kind == "distinct":
        per_tag = r.random() < 0.5
        group = " GROUP BY buildingID" if per_tag else ""
        tag_sel = ", buildingID" if per_tag else ""
        w_and = f" AND ({where_sql})" if where_sql else ""
        iql = (
            f"SELECT distinct(flowRate) FROM campus_flow"
            f"{w_iql}{group}"
        )
        # null field values are not points → excluded
        sql = (
            f'SELECT DISTINCT flowRate AS "distinct"{tag_sel} '
            f"FROM campus_flow WHERE flowRate IS NOT NULL{w_and}"
        )
        return iql, sql, "agg"
    n = r.choice([1, 2, 3])
    bucketed = r.random() < 0.5
    bucket_min = r.choice([120, 240])
    bsec = bucket_min * 60
    group = f" GROUP BY time({bucket_min}m)" if bucketed else ""
    w_and = f" AND ({where_sql})" if where_sql else ""
    iql = (
        f"SELECT {kind}(tempC, {n}) FROM campus_flow{w_iql}{group}"
    )
    order = "DESC" if kind == "top" else "ASC"
    part = (
        f"PARTITION BY CAST(floor(epoch(time) / {bsec}) AS BIGINT) "
        if bucketed
        else ""
    )
    sql = f"""
        SELECT time, tempC AS {kind} FROM (
          SELECT time, tempC,
                 ROW_NUMBER() OVER ({part}ORDER BY tempC {order})
                   AS rn
          FROM campus_flow WHERE tempC IS NOT NULL{w_and}
        ) WHERE rn <= {n}
    """
    return iql, sql, "transform"


def _gen_companion(r: random.Random, where_iql: str, where_sql: str):
    """Selector + companion columns: the companions come from THE
    selected point. max/min fuzz on tempC (strictly monotone → the
    selected point is unique); first/last on flowRate (timestamps
    unique → unique regardless of value ties)."""
    fn = r.choice(["max", "min", "first", "last", "percentile"])
    f = "flowRate" if fn in ("first", "last") else "tempC"
    comp = r.choice(["buildingID", "flowRate" if f == "tempC" else "tempC"])
    bucketed = r.random() < 0.5
    bucket_min = r.choice([120, 240])
    bsec = bucket_min * 60
    w_iql = f" WHERE {where_iql}" if where_iql else ""
    w_and = f" AND ({where_sql})" if where_sql else ""
    group = f" GROUP BY time({bucket_min}m)" if bucketed else ""
    pct = r.choice([10, 50, 90])
    call = f"percentile({f}, {pct})" if fn == "percentile" else f"{fn}({f})"
    iql = f"SELECT {call}, {comp} FROM campus_flow{w_iql}{group}"
    if fn in ("max",):
        order = f"{f} DESC, time ASC"
    elif fn in ("min", "percentile"):
        order = f"{f} ASC, time ASC"
    elif fn == "first":
        order = "time ASC"
    else:
        order = "time DESC"
    bucket_sql = (
        f"to_timestamp(CAST(floor(epoch(time) / {bsec}) AS BIGINT) "
        f"* {bsec})"
    )
    pkey = (
        f"PARTITION BY CAST(floor(epoch(time) / {bsec}) AS BIGINT)"
        if bucketed
        else ""
    )
    part = f"{pkey} " if pkey else ""
    tcol = f"{bucket_sql} AS time_bucket" if bucketed else "time"
    if fn == "percentile":
        # nearest-rank POINT: 1-based floor(n*p/100 + 0.5)
        keep = (
            f"rn = CAST(floor(cnt * {pct} / 100.0 + 0.5) AS BIGINT) "
            f"AND CAST(floor(cnt * {pct} / 100.0 + 0.5) AS BIGINT) >= 1"
        )
        cnt = f", COUNT(*) OVER ({pkey}) AS cnt"
    else:
        keep = "rn = 1"
        cnt = ""
    sql = f"""
        SELECT {tcol}, {f} AS {fn}, {comp} FROM (
          SELECT time, {f}, {comp},
                 ROW_NUMBER() OVER ({part}ORDER BY {order}) AS rn{cnt}
          FROM campus_flow WHERE {f} IS NOT NULL{w_and}
        ) WHERE {keep}
    """
    return iql, sql, "transform"


def _gen_top_tag(r: random.Random, where_iql: str, where_sql: str):
    """top/bottom(f, tag, N): extreme point per tag value, top-N tag
    values by their extreme. tempC is strictly monotone → tie-free."""
    fn = r.choice(["top", "bottom"])
    n = r.choice([1, 2, 3])
    bucketed = r.random() < 0.4
    bucket_min = 240
    bsec = bucket_min * 60
    w_iql = f" WHERE {where_iql}" if where_iql else ""
    w_and = f" AND ({where_sql})" if where_sql else ""
    group = f" GROUP BY time({bucket_min}m)" if bucketed else ""
    iql = (
        f"SELECT {fn}(tempC, buildingID, {n}) FROM campus_flow"
        f"{w_iql}{group}"
    )
    order = "DESC" if fn == "top" else "ASC"
    bkey = (
        f"CAST(floor(epoch(time) / {bsec}) AS BIGINT)" if bucketed else "1"
    )
    sql = f"""
        WITH best AS (
          SELECT time, tempC, buildingID, {bkey} AS bk,
                 ROW_NUMBER() OVER (
                   PARTITION BY {bkey}, buildingID
                   ORDER BY tempC {order}, time ASC) AS rn
          FROM campus_flow WHERE tempC IS NOT NULL{w_and}
        ),
        ranked AS (
          SELECT time, tempC, buildingID,
                 ROW_NUMBER() OVER (
                   PARTITION BY bk
                   ORDER BY tempC {order}, time ASC) AS rn2
          FROM best WHERE rn = 1
        )
        SELECT time, tempC AS {fn}, buildingID
        FROM ranked WHERE rn2 <= {n}
    """
    return iql, sql, "transform"


def gen_calendar_case(r: random.Random):
    """Calendar buckets (the documented extension beyond InfluxQL
    1.x): time(1mo)/time(3mo)/time(1y) over the months-spanning
    daily fixture. The epoch month axis is Jan 1970, so 3-month
    tiles ARE calendar quarters — date_trunc is the oracle."""
    fn = r.choice(sorted(AGGS) + EXTRA_AGGS)
    spec, trunc = r.choice(
        [("1mo", "month"), ("3mo", "quarter"), ("1y", "year")]
    )
    tags = ["buildingID"] if r.random() < 0.5 else []
    alias = f"{fn}_flowRate"
    # the daily table has no tempC column: the engine null-fills
    # unknown identifiers but DuckDB would fail to compile — redraw
    atoms = []
    if r.random() < 0.4:
        a = _gen_atom(r)
        while "tempC" in a[0]:
            a = _gen_atom(r)
        atoms.append(a)
    w_iql = f" WHERE {atoms[0][0]}" if atoms else ""
    w_sql = f" WHERE {atoms[0][1]}" if atoms else ""
    group_iql = [f"time({spec})"] + tags
    iql = (
        f"SELECT {fn}(flowRate) FROM campus_daily{w_iql} "
        f"GROUP BY {', '.join(group_iql)}"
    )
    tag_sel = (", " + ", ".join(tags)) if tags else ""
    group_cols = ", ".join(["1"] + (["3"] if tags else []))
    sql = (
        f"SELECT CAST(date_trunc('{trunc}', time) AS TIMESTAMP) "
        f"AS time_bucket, {_agg_sql(fn, 'flowRate')} AS {alias}"
        f"{tag_sel} FROM campus_daily{w_sql} "
        f"GROUP BY {group_cols}"
    )
    return iql, sql, "agg"


#: fn → DuckDB rendering with the engine's NULL-on-domain-error
#: semantics made explicit (DuckDB THROWS on acos(2)/sqrt(-1)/ln(0),
#: the engine yields NULL — the CASE guards reconcile the two).
_MATH_SQL = {
    "abs": lambda x: f"abs({x})",
    "ceil": lambda x: f"ceil({x})",
    "floor": lambda x: f"floor({x})",
    "round": lambda x: f"round({x})",
    "exp": lambda x: f"exp({x})",
    "sin": lambda x: f"sin({x})",
    "cos": lambda x: f"cos({x})",
    "tan": lambda x: f"tan({x})",
    "atan": lambda x: f"atan({x})",
    "sqrt": lambda x: f"CASE WHEN ({x}) >= 0 THEN sqrt({x}) END",
    "ln": lambda x: f"CASE WHEN ({x}) > 0 THEN ln({x}) END",
    "log2": lambda x: f"CASE WHEN ({x}) > 0 THEN log2({x}) END",
    "log10": lambda x: f"CASE WHEN ({x}) > 0 THEN log10({x}) END",
    "acos": lambda x: (
        f"CASE WHEN ({x}) BETWEEN -1 AND 1 THEN acos({x}) END"
    ),
    "asin": lambda x: (
        f"CASE WHEN ({x}) BETWEEN -1 AND 1 THEN asin({x}) END"
    ),
}


def gen_math_case(r: random.Random):
    """Point-wise math over a raw field or over an aggregate, with
    the occasional arithmetic composition / two-arg form."""
    f = r.choice(FIELDS)
    where_iql, where_sql = gen_where(r, allow_or=False)
    w_iql = f" WHERE {where_iql}" if where_iql else ""
    w_sql = f" WHERE {where_sql}" if where_sql else ""
    roll = r.random()
    if roll < 0.25:
        # two-arg forms over raw points
        form = r.choice(["pow", "log", "atan2"])
        if form == "pow":
            e = r.choice(["2", "3", "-1", "0.5"])
            iql = f"SELECT pow({f}, {e}) FROM campus_flow{w_iql}"
            # engine NULLs NaN (neg base, frac exponent); DuckDB
            # returns NaN for the same input — reconcile via isnan
            raw = f"pow({f}, {e})"
            expr = f"CASE WHEN isnan({raw}) THEN NULL ELSE {raw} END"
            alias = "pow"
        elif form == "log":
            b = r.choice(["2", "10"])
            iql = f"SELECT log({f}, {b}) FROM campus_flow{w_iql}"
            # engine formula: ln(x)/ln(b)
            expr = f"CASE WHEN ({f}) > 0 THEN ln({f})/ln({b}.0) END"
            alias = "log"
        else:
            g = FIELDS[1 - FIELDS.index(f)]
            iql = f"SELECT atan2({f}, {g}) FROM campus_flow{w_iql}"
            expr = f"atan2({f}, {g})"
            alias = "atan2"
        sql = (
            f"SELECT time, {expr} AS {alias} FROM campus_flow{w_sql}"
        )
        return iql, sql, "math"
    fn = r.choice(sorted(_MATH_SQL))
    if roll < 0.65:
        # unary over raw points, sometimes composed arithmetically
        if r.random() < 0.3:
            iql = (
                f"SELECT {fn}({f}) * 2 + 1 AS x FROM campus_flow{w_iql}"
            )
            sql = (
                f"SELECT time, ({_MATH_SQL[fn](f)}) * 2 + 1 AS x "
                f"FROM campus_flow{w_sql}"
            )
        else:
            iql = f"SELECT {fn}({f}) FROM campus_flow{w_iql}"
            sql = (
                f"SELECT time, {_MATH_SQL[fn](f)} AS {fn} "
                f"FROM campus_flow{w_sql}"
            )
        return iql, sql, "math"
    # math over an aggregate, bucketed
    agg = r.choice(["mean", "sum", "min", "max"])
    bucket_min = r.choice([30, 60, 120])
    tags = ["buildingID"] if r.random() < 0.5 else []
    group_iql = [f"time({bucket_min}m)"] + tags
    iql = (
        f"SELECT {fn}({agg}({f})) FROM campus_flow{w_iql} "
        f"GROUP BY {', '.join(group_iql)}"
    )
    bsec = bucket_min * 60
    bucket_sql = (
        f"to_timestamp(CAST(floor(epoch(time) / {bsec}) "
        f"AS BIGINT) * {bsec})"
    )
    agg_expr = _agg_sql(agg, f)
    sel_tags = (", " + ", ".join(tags)) if tags else ""
    group_cols = ["1"] + (["3"] if tags else [])
    sql = (
        f"SELECT {bucket_sql} AS time_bucket, "
        f"{_MATH_SQL[fn](agg_expr)} AS {fn}{sel_tags} "
        f"FROM campus_flow{w_sql} "
        f"GROUP BY {', '.join(group_cols)}"
    )
    return iql, sql, "math"


def gen_case(r: random.Random):
    """One generated (influxql, duckdb_sql, kind) case."""
    roll = r.random()
    if roll < 0.06:
        return gen_math_case(r)
    if roll < 0.12:
        return gen_fill_case(r)
    if roll < 0.18:
        return gen_tz_fill_case(r)
    if roll < 0.30:
        return gen_transform_case(r)
    if roll < 0.40:
        return gen_rank_case(r)
    if roll < 0.50:
        return gen_subquery_case(r)
    if roll < 0.58:
        return gen_selector_case(r)
    if roll < 0.64:
        return gen_raw_transform_case(r)
    if roll < 0.70:
        return gen_calendar_case(r)
    where_iql, where_sql = gen_where(r)
    w_iql = f" WHERE {where_iql}" if where_iql else ""
    w_sql = f" WHERE {where_sql}" if where_sql else ""
    if r.random() < 0.45:
        # raw select of 1-2 fields
        fields = r.sample(FIELDS, 1 + r.randrange(2))
        iql = f"SELECT {', '.join(fields)} FROM campus_flow{w_iql}"
        # engine contract (catalog oracles, e.g. influxql_select_range):
        # raw select emits time + fields for every matching ROW, null
        # fields included — the relational projection of the point
        sql = (
            f"SELECT time, {', '.join(fields)} FROM campus_flow{w_sql}"
        )
        return iql, sql, "raw"
    fn = r.choice(sorted(AGGS) + EXTRA_AGGS)
    f = r.choice(FIELDS)
    alias = f"{fn}_{f}"
    bucket_min = r.choice([15, 30, 60, 120])
    off_min = r.choice([0, 0, 5, 15])
    tags = ["buildingID"] if r.random() < 0.5 else []
    tspec = (
        f"time({bucket_min}m, {off_min}m)"
        if off_min
        else f"time({bucket_min}m)"
    )
    group_iql = [tspec] + tags
    iql = (
        f"SELECT {fn}({f}) FROM campus_flow{w_iql} "
        f"GROUP BY {', '.join(group_iql)}"
    )
    # engine bucket = epoch-aligned floor, shifted by the offset:
    # floor((epoch - off) / width) * width + off; empty buckets
    # absent with fill none (no closed time range → no dense axis)
    bsec, osec = bucket_min * 60, off_min * 60
    bucket_sql = (
        f"to_timestamp(CAST(floor((epoch(time) - {osec}) / {bsec}) "
        f"AS BIGINT) * {bsec} + {osec})"
    )
    sel_tags = (", " + ", ".join(tags)) if tags else ""
    group_cols = ["1"] + (["3"] if tags else [])
    agg_sql = _agg_sql(fn, f)
    # no HAVING: the engine keeps a group whose field values are all
    # null (count=0 / null aggregate) — relational semantics; DuckDB
    # produces the identical group row, so both sides agree
    sql = (
        f"SELECT {bucket_sql} AS time_bucket, {agg_sql} AS {alias}"
        f"{sel_tags} FROM campus_flow{w_sql} "
        f"GROUP BY {', '.join(group_cols)}"
    )
    return iql, sql, "agg"


# ------------------------------------------------------------ compare


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if isinstance(row, dict) else row[cols.index(c)]
            if isinstance(v, dt.datetime):
                v = v.replace(tzinfo=None).isoformat()
            elif isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            out_v = v
            vals.append(out_v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def run_case(fixture, iql: str, sql: str, kind: str) -> None:
    sdf = query_measurement(None, fixture["tables"], iql)
    spark_rows = [r.asDict() for r in sdf.collect()]
    duck = fixture["con"].execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    if kind == "raw":
        cols = sorted(sdf.columns)
        assert sorted(duck_cols) == cols, (sorted(duck_cols), cols, iql)
    else:
        cols = sorted(sdf.columns)
        assert sorted(duck_cols) == cols, (sorted(duck_cols), cols, iql)
    got = canon(spark_rows, cols)
    want = canon(
        [dict(zip(duck_cols, r)) for r in duck_rows], cols
    )
    if kind == "math":
        # transcendental results (exp, tan, …) differ between JVM
        # and libm in the last ULP — a RELATIVE error, so compare at
        # 11 significant digits instead of canon's absolute 6dp
        # (which is stricter for magnitudes < 1e5, looser above)
        sig = lambda t: tuple(  # noqa: E731
            # + 0.0 canonicalizes -0.0 (DuckDB ceil(-0.5) → -0.0,
            # Spark → 0.0 — equal values, different sort strings)
            float(f"{v:.11g}") + 0.0 if isinstance(v, float) else v
            for v in t
        )
        key = lambda t: tuple(str(x) for x in t)  # noqa: E731
        got = sorted((sig(t) for t in got), key=key)
        want = sorted((sig(t) for t in want), key=key)
    assert got == want, (
        f"mismatch for {iql!r}\n vs {sql!r}\n"
        f"spark({len(got)}): {got[:5]}\n duck({len(want)}): {want[:5]}"
    )


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_random_statements_match_duckdb(fixture, seed):
    r = random.Random(seed)
    iql, sql, kind = gen_case(r)
    run_case(fixture, iql, sql, kind)
