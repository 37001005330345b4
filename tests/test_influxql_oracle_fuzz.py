"""Differential oracle fuzz: random InfluxQL statements vs DuckDB.

The fixed 129-query catalog pins known-good statements; the statement
fuzz (test_influxql_statement_fuzz) pins crash-freedom. This suite
closes the gap between them: it generates random statements from a
STRUCTURED AST (not text mutation), renders the same AST as (a)
InfluxQL for this engine and (b) ANSI SQL for DuckDB, executes both
on identical data, and compares row counts and values — randomized
correctness, not just totality.

Covered AST space: raw selects and single-aggregate selects with
tag/field/time WHERE conjunctions, GROUP BY time(N)+tags (fill none),
over a fixture with nulls in both a field and a tag. Aggregates
restricted to the exactly-representable ones (sum/count/min/max/mean
over 2-dp-ish doubles at tiny row counts is float-stable; stddev /
percentile interpolation are pinned by the catalog oracles instead).
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


@pytest.fixture(scope="module")
def fixture(spark):
    pdf = pd.DataFrame(
        _rows(), columns=["time", "buildingID", "flowRate", "tempC"]
    )
    df = spark.createDataFrame(
        _rows(),
        "time timestamp, buildingID string, flowRate double, tempC double",
    )
    con = duckdb.connect()
    con.register("campus_flow", pdf)
    return {"tables": {"campus_flow": df}, "con": con}


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


def gen_where(r: random.Random):
    """Conjunction of 0-3 atoms; returns (influxql, sql) pair."""
    iql, sql = [], []
    for _ in range(r.randrange(4)):
        kind = r.randrange(4)
        if kind == 0:
            v = r.choice(["A", "B", "C", "Z"])
            op = r.choice(["=", "!="])
            iql.append(f"buildingID {op} '{v}'")
            # engine semantics: comparisons are null-rejecting both
            # sides (Spark three-valued logic, mirrored in SQL)
            sql.append(f"buildingID {'=' if op == '=' else '<>'} '{v}'")
        elif kind == 1:
            lo = BASE + dt.timedelta(minutes=r.randrange(0, 400))
            op = r.choice([">=", "<", ">", "<="])
            iql.append(f"time {op} '{lo:%Y-%m-%d %H:%M:%S}'")
            sql.append(f"time {op} TIMESTAMP '{lo:%Y-%m-%d %H:%M:%S}'")
        elif kind == 2:
            f = r.choice(FIELDS)
            thresh = round(r.uniform(-3, 12), 2)
            op = r.choice([">", "<", ">=", "<="])
            iql.append(f"{f} {op} {thresh}")
            sql.append(f"{f} {op} {thresh}")
        else:
            pat = r.choice(["^[AB]$", "A|C", "^B"])
            op = r.choice(["=~", "!~"])
            iql.append(f"buildingID {op} /{pat}/")
            m = f"regexp_matches(buildingID, '{pat}')"
            sql.append(m if op == "=~" else f"NOT {m}")
    return " AND ".join(iql), " AND ".join(sql)


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
        ["difference", "cumulative_sum", "arith", "derivative"]
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


def gen_case(r: random.Random):
    """One generated (influxql, duckdb_sql, kind) case."""
    roll = r.random()
    if roll < 0.18:
        return gen_fill_case(r)
    if roll < 0.36:
        return gen_transform_case(r)
    if roll < 0.5:
        return gen_rank_case(r)
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
    tags = ["buildingID"] if r.random() < 0.5 else []
    group_iql = [f"time({bucket_min}m)"] + tags
    iql = (
        f"SELECT {fn}({f}) FROM campus_flow{w_iql} "
        f"GROUP BY {', '.join(group_iql)}"
    )
    # engine bucket = epoch-aligned floor; empty buckets absent with
    # fill none (no closed time range → no dense axis)
    bucket_sql = (
        f"to_timestamp(CAST(floor(epoch(time) / {bucket_min * 60}) "
        f"AS BIGINT) * {bucket_min * 60})"
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
