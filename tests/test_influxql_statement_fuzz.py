"""Statement-level fuzz of the InfluxQL dispatcher.

The grammar is ~2,500 lines of regex dispatch — the highest-surface-
area code in the repo (VERDICT r9 Next #7). The select-expression
parser already has hypothesis property tests
(test_arith_parser_properties.py); this suite generates WHOLE
statements — random SELECT / WHERE / GROUP BY / fill / LIMIT / admin
compositions, valid and deliberately mutated — and asserts the
dispatcher's total-function contract:

  every statement either evaluates (DataFrame / int / bool / list …)
  or raises the NAMED InfluxQLError — never a bare stack trace
  (AttributeError / IndexError / KeyError / re.error / pyspark
  AnalysisException leaking from regex-dispatch internals).

Valid-shaped SELECTs additionally must return a DataFrame whose plan
RESOLVES (``df.columns`` forces analysis) — a statement the grammar
accepts must also build an executable plan.

``tools/experiments/influxql_fuzz_10k.py`` runs the same generators
for ≥10k statements as the round's evidence artifact; this in-suite
version keeps CI time bounded.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ciws_server_spark.plans.influxql import (
    InfluxQLError,
    query_measurement,
    run_influxql,
)

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)

# ---------------------------------------------------------------- data


@pytest.fixture(scope="module")
def tables(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 6, 0) + dt.timedelta(seconds=4 * i),
         "A" if i % 2 else "B",
         None if i % 7 == 3 else float(i), float(i) * 0.5,
         # a STRING field: numeric-only aggregates/transforms must
         # see zero numeric points, never leak an executor cast error
         None if i % 5 == 1 else f"s{i % 4}")
        for i in range(40)
    ]
    schema = (
        "time timestamp, buildingID string, flowRate double, "
        "tempC double, status string"
    )
    df = spark.createDataFrame(rows, schema)
    other = spark.createDataFrame(rows[:10], schema)
    return {"campus_flow": df, "campus_flow_hourly": other}


# ------------------------------------------------------------ builders
#
# Build from a seeded random.Random so the standalone 10k runner can
# reuse the exact generators without hypothesis.

FIELDS = ["flowRate", "tempC", "bogusField", "status"]
TAGS = ["buildingID", "missingTag"]
AGGS = ["mean", "sum", "count", "min", "max", "median", "spread",
        "stddev", "first", "last", "distinct", "mode"]
SELECTORS = ["top", "bottom", "percentile"]
TRANSFORMS = ["derivative", "difference", "cumulative_sum", "elapsed",
              "moving_average", "non_negative_derivative", "integral",
              "exponential_moving_average", "chande_momentum_oscillator",
              "relative_strength_index", "kaufmans_efficiency_ratio",
              "kaufmans_adaptive_moving_average",
              "double_exponential_moving_average",
              "triple_exponential_moving_average", "triple_exponential_derivative",
              "holt_winters", "sample", "histogram", "nosuchfn"]
DURATIONS = ["10s", "1m", "5m", "1h", "1d", "1w", "1mo", "3mo", "1y",
             "0s", "7x", ""]
MATH_FNS = ["abs", "acos", "asin", "atan", "atan2", "ceil", "cos",
            "exp", "floor", "ln", "log", "log2", "log10", "pow",
            "round", "sin", "sqrt", "tan"]
FILLS = ["null", "none", "previous", "linear", "0", "3.5", "bogus"]
TIME_LITS = [
    "'2024-01-01 06:00:00'", "'2024-01-01T06:00:10Z'",
    "1704088800000000000", "1704088800s", "1704088800000ms",
    "now() - 1h", "now() + 30m", "'not a time'",
]


def gen_field_expr(r: random.Random) -> str:
    kind = r.randrange(8)
    f = r.choice(FIELDS)
    if kind == 0:
        return f
    if kind == 1:
        return f'"{f}"'
    if kind == 2:
        if r.random() < 0.15:
            return f"count(distinct({f}))"
        return f"{r.choice(AGGS)}({f})"
    if kind == 3:
        fn = r.choice(SELECTORS)
        arg = r.choice(["3", "1", "0", "95.5", ""])
        if fn != "percentile" and r.random() < 0.3:
            # three-argument form: top(f, tag, N)
            tag = r.choice(TAGS + ["42", "''"])
            return f"{fn}({f}, {tag}, {arg or '2'})"
        if r.random() < 0.3:
            # selector + companion columns
            sel = r.choice(["max", "min", "first", "last", "mean"])
            comp = r.choice(FIELDS + TAGS)
            call = (
                f"percentile({f}, {arg or '50'})"
                if fn == "percentile"
                else f"{sel}({f})"
            )
            return f"{call}, {comp}"
        return f"{fn}({f}, {arg})" if arg else f"{fn}({f})"
    if kind == 4:
        fn = r.choice(TRANSFORMS)
        if fn in ("moving_average", "exponential_moving_average"):
            return f"{fn}({r.choice(AGGS)}({f}), {r.choice(['3', '0', '2'])})"
        if fn == "derivative":
            return f"{fn}({r.choice(AGGS)}({f}), {r.choice(DURATIONS)})"
        if fn == "holt_winters":
            return f"{fn}({r.choice(AGGS)}({f}), 3, 0)"
        return f"{fn}({r.choice(AGGS)}({f}))"
    if kind == 5:  # select-item arithmetic
        g = r.choice(FIELDS)
        op = r.choice(["+", "-", "*", "/"])
        if r.random() < 0.5:
            return f"{f} {op} {g}"
        return f"mean({f}) {op} mean({g})"
    if kind == 6:
        if r.random() < 0.4:  # point-wise math calls, incl. bad arity
            fn = r.choice(MATH_FNS)
            inner = f"{r.choice(AGGS)}({f})" if r.random() < 0.3 else f
            arg2 = r.choice([", 2", ", -1", ", 0.5", ", cold", ""])
            expr = f"{fn}({inner}{arg2})"
            if r.random() < 0.3:
                expr = f"{expr} {r.choice(['+', '*', '-'])} 1"
            if r.random() < 0.2:
                expr = f"-{expr}"
            return expr
        return f"{gen_field_expr(r)} AS alias_{r.randrange(5)}"
    return r.choice(["*", "/flow/", "42", "''"])


def gen_where(r: random.Random) -> str:
    clauses = []
    for _ in range(r.randrange(3)):
        kind = r.randrange(6)
        if kind == 0:
            clauses.append(
                f"{r.choice(TAGS)} {r.choice(['=', '!=', '<>'])} "
                f"'{r.choice(['A', 'B', 'Z', ''])}'"
            )
        elif kind == 1:
            clauses.append(
                f"time {r.choice(['>=', '<=', '>', '<', '='])} "
                f"{r.choice(TIME_LITS)}"
            )
        elif kind == 2:
            # includes type-mismatched literals: a numeric field vs a
            # bare word / boolean / quoted string must compile to a
            # no-match predicate, never an executor CAST error (r11)
            rhs = r.choice(
                [f"{r.uniform(-5, 40):.1f}"] * 3
                + ["true", "FALSE", "banana", "'word'", "''"]
            )
            clauses.append(
                f"{r.choice(FIELDS)} {r.choice(['>', '<', '>=', '<=', '=', '!='])} "
                f"{rhs}"
            )
        elif kind == 3:
            clauses.append(
                f"{r.choice(TAGS)} {r.choice(['=~', '!~'])} "
                f"{r.choice(['/^[AB]$/', '//', '/(/', 'not-a-regex'])}"
            )
        elif kind == 4:
            clauses.append("time =~ /x/")  # named-invalid
        else:
            inner = gen_where(r) or "flowRate > 0"
            clauses.append(f"({inner})")
    return f" {r.choice(['AND', 'OR'])} ".join(clauses)


def gen_group_by(r: random.Random) -> str:
    parts = []
    if r.random() < 0.6:
        d = r.choice(DURATIONS)
        if r.random() < 0.3:
            parts.append(f"time({d}, {r.choice(DURATIONS)})")
        else:
            parts.append(f"time({d})")
    if r.random() < 0.4:
        parts.append(r.choice(TAGS))
    if r.random() < 0.1:
        parts.append("*")
    return ", ".join(parts)


def gen_select(r: random.Random) -> str:
    n = 1 + r.randrange(2)
    fields = ", ".join(gen_field_expr(r) for _ in range(n))
    frm = r.choice([
        "campus_flow", '"campus_flow"', "campus_flow, campus_flow_hourly",
        "/^campus/", "/nomatch_.*/", "no_such_measurement", '"db"."rp"."campus_flow"',
    ])
    q = f"SELECT {fields} FROM {frm}"
    w = gen_where(r)
    if w:
        q += f" WHERE {w}"
    g = gen_group_by(r)
    if g:
        q += f" GROUP BY {g}"
        if r.random() < 0.4:
            q += f" fill({r.choice(FILLS)})"
    if r.random() < 0.3:
        q += f" ORDER BY time {r.choice(['ASC', 'DESC'])}"
    for kw in ("LIMIT", "OFFSET", "SLIMIT", "SOFFSET"):
        if r.random() < 0.2:
            q += f" {kw} {r.choice(['5', '0', '-1'])}"
    if r.random() < 0.25:
        # tz(): valid zones must evaluate (incl. composed with fill,
        # r11); bogus zones must raise the named error
        q += " tz('{}')".format(r.choice([
            "America/Chicago", "Asia/Kolkata", "UTC",
            "Mars/Olympus", "", "America/Nowhere",
        ]))
    if r.random() < 0.1:
        q = f"SELECT mean(m) FROM ({q}) GROUP BY time(1h)"
    return q


ADMIN = [
    "DELETE FROM /^campus/ WHERE buildingID = 'A'",
    "DELETE WHERE time < '2024-01-01'",
    "DROP SERIES WHERE buildingID = 'A'",
    "DELETE",
    "DROP SERIES",
    "SHOW SHARDS",
    "SHOW SHARD GROUPS",
    "DROP SHARD 1",
    "DROP SHARD 0",
    "SHOW QUERIES",
    "KILL QUERY 1",
    "SHOW STATS",
    "SHOW DIAGNOSTICS",
    "SHOW SUBSCRIPTIONS",
    "CREATE SUBSCRIPTION \"s\" ON ciws.\"autogen\" DESTINATIONS ALL 'http://h:1'",
    "CREATE SUBSCRIPTION s ON ciws.autogen DESTINATIONS",
    "DROP SUBSCRIPTION \"s\" ON ciws.\"autogen\"",
    "SHOW MEASUREMENTS",
    "SHOW MEASUREMENTS WITH MEASUREMENT =~ /^campus/",
    "SHOW MEASUREMENTS WITH MEASUREMENT = campus_flow",
    "SHOW MEASUREMENTS WITH MEASUREMENT =~ /(/",
    "SHOW MEASUREMENTS LIMIT 1 OFFSET 1",
    "SHOW DATABASES",
    "SHOW SERIES",
    "SHOW SERIES CARDINALITY",
    "SHOW SERIES EXACT CARDINALITY",
    "SHOW TAG VALUES EXACT CARDINALITY WITH KEY = buildingID",
    "SHOW MEASUREMENT CARDINALITY",
    "SHOW TAG KEY CARDINALITY",
    "SHOW FIELD KEY CARDINALITY FROM campus_flow",
    "SHOW TAG VALUES CARDINALITY WITH KEY = buildingID",
    "SHOW TAG VALUES WITH KEY =~ /./",
    "SHOW TAG VALUES WITH KEY = buildingID",
    "SHOW TAG VALUES CARDINALITY",
    "SHOW SERIES FROM campus_flow",
    "SHOW SERIES FROM /^campus/",
    "SHOW SERIES FROM campus_flow WHERE buildingID = 'A'",
    "SHOW TAG VALUES WITH KEY = buildingID WHERE missingTag = 'x'",
    "SHOW TAG KEYS WHERE buildingID = 'A'",
    "SHOW SERIES FROM campus_flow WHERE garbage !!!",
    "SHOW TAG KEYS FROM /^campus/",
    "SHOW TAG KEYS FROM /(/",
    "SHOW FIELD KEYS FROM /nomatch/",
    "SHOW TAG VALUES FROM /^campus/ WITH KEY =~ /building/",
    "SHOW TAG KEYS",
    "SHOW TAG KEYS FROM campus_flow",
    "SHOW FIELD KEYS FROM campus_flow",
    "SHOW TAG VALUES FROM campus_flow WITH KEY = buildingID",
    "SHOW TAG VALUES FROM campus_flow WITH KEY IN (buildingID, missingTag)",
    "SHOW TAG VALUES FROM campus_flow WITH KEY IN ()",
    "SHOW TAG VALUES FROM campus_flow WITH KEY =~ /building/",
    "SHOW TAG VALUES FROM campus_flow WITH KEY !~ /building/",
    "SHOW TAG VALUES FROM campus_flow WITH KEY =~ /(/",
    "SHOW RETENTION POLICIES",
    "SHOW CONTINUOUS QUERIES",
    "CREATE USER fuzzu WITH PASSWORD 'pw'",
    "CREATE USER fuzzu WITH PASSWORD 'pw' WITH ALL PRIVILEGES",
    "SET PASSWORD FOR fuzzu = 'pw2'",
    "GRANT READ ON ciws TO fuzzu",
    "GRANT ALL PRIVILEGES TO fuzzu",
    "REVOKE WRITE ON nosuchdb FROM fuzzu",
    "SHOW USERS",
    "SHOW GRANTS FOR fuzzu",
    "SHOW GRANTS FOR ghost",
    "DROP USER fuzzu",
    "CREATE DATABASE fuzzdb",
    "DROP DATABASE fuzzdb",
    "DELETE FROM campus_flow WHERE time < now()",
    "DROP MEASUREMENT campus_flow",
    "DROP SERIES FROM campus_flow WHERE buildingID = 'A'",
    "CREATE RETENTION POLICY p ON d DURATION 1h REPLICATION 1",
    "ALTER RETENTION POLICY p ON d DURATION 2h",
    "DROP RETENTION POLICY p ON d",
    'CREATE CONTINUOUS QUERY c ON d BEGIN SELECT mean(flowRate) INTO m'
    " FROM campus_flow GROUP BY time(1h) END",
    'CREATE CONTINUOUS QUERY ctz ON d BEGIN SELECT mean(flowRate) INTO m'
    " FROM campus_flow GROUP BY time(1h) tz('Asia/Kolkata') END",
    'CREATE CONTINUOUS QUERY cbad ON d BEGIN SELECT mean(flowRate) INTO m'
    " FROM campus_flow GROUP BY time(1h) tz('Mars/Olympus') END",
    "DROP CONTINUOUS QUERY c ON d",
    "SELECT mean(flowRate) INTO target FROM campus_flow GROUP BY time(1h)",
]


def mutate(r: random.Random, stmt: str) -> str:
    kind = r.randrange(6)
    if kind == 0 and len(stmt) > 4:  # truncate
        return stmt[: r.randrange(3, len(stmt))]
    if kind == 1:  # drop one token
        toks = stmt.split(" ")
        if len(toks) > 2:
            del toks[r.randrange(len(toks))]
        return " ".join(toks)
    if kind == 2:  # duplicate a token
        toks = stmt.split(" ")
        i = r.randrange(len(toks))
        toks.insert(i, toks[i])
        return " ".join(toks)
    if kind == 3:  # inject junk
        junk = r.choice([";", "''", "((", "))", "/", "\\", "\x00", "🦆",
                         "-- comment", "' OR '1'='1"])
        i = r.randrange(len(stmt) + 1)
        return stmt[:i] + junk + stmt[i:]
    if kind == 4:
        return stmt.swapcase()
    return stmt.replace("SELECT", r.choice(["SELEKT", "SELECT SELECT", ""]))


def gen_statement(r: random.Random) -> str:
    roll = r.random()
    if roll < 0.55:
        stmt = gen_select(r)
    elif roll < 0.75:
        stmt = r.choice(ADMIN)
    else:
        stmt = mutate(r, gen_select(r) if r.random() < 0.7
                      else r.choice(ADMIN))
    if r.random() < 0.05:
        # EXPLAIN wraps anything — SELECT plans, everything else is
        # the named only-SELECT error
        stmt = r.choice(["EXPLAIN ", "EXPLAIN ANALYZE "]) + stmt
    if r.random() < 0.15:
        stmt = mutate(r, stmt)
    return stmt


# ---------------------------------------------------------------- fuzz

#: The dispatcher's contract: these — and ONLY these — may escape.
#: InfluxQLError covers the whole named-error surface (bad grammar,
#: out-of-surface functions, write-without-table_dir); everything
#: else is a stack trace the server would 500 on.
ALLOWED = (InfluxQLError,)


def check_one(spark, tables, stmt: str, execute: bool = False) -> str:
    try:
        out = run_influxql(spark, tables, stmt, table_dir=None, now=NOW)
    except ALLOWED:
        return "named-error"
    except Exception as exc:  # pragma: no cover - the fuzz target
        raise AssertionError(
            f"dispatcher leaked {type(exc).__name__} for {stmt!r}: {exc}"
        ) from exc
    if hasattr(out, "columns"):
        assert out.columns is not None  # plan must resolve
        if execute:
            # executor-side total-function check: a plan the grammar
            # accepted must also RUN (rlike compiles patterns on the
            # executor; Arrow UDF folds only fail at action time)
            try:
                out.limit(50).collect()
            except ALLOWED:
                return "named-error"
            except Exception as exc:  # pragma: no cover
                raise AssertionError(
                    f"execution leaked {type(exc).__name__} for "
                    f"{stmt!r}: {exc}"
                ) from exc
            return "ok-executed"
    return "ok"


@settings(
    max_examples=250,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_dispatcher_total_function(spark, tables, seed):
    r = random.Random(seed)
    # every ~10th accepted statement also executes (bounded collect)
    check_one(spark, tables, gen_statement(r), execute=(seed % 10 == 0))


def test_unknown_identifiers_match_nothing(spark, tables):
    """Identifiers absent from the measurement are NULL columns
    (InfluxDB field semantics: the comparison matches no rows, the
    selected column comes back empty) — found by the statement fuzz
    as an AnalysisException leak, now pinned."""
    # WHERE on unknown name: no rows, no crash
    assert (
        query_measurement(
            spark, tables,
            "SELECT flowRate FROM campus_flow WHERE ghost = 'x'",
        ).count()
        == 0
    )
    # != / !~ on unknown name also match nothing (documented
    # divergence from InfluxDB's missing-tag-as-'' semantics)
    assert (
        query_measurement(
            spark, tables,
            "SELECT flowRate FROM campus_flow WHERE ghost != 'x'",
        ).count()
        == 0
    )
    # unknown field under an aggregate: one all-null bucket row set
    df = query_measurement(
        spark, tables,
        "SELECT mean(ghost) FROM campus_flow GROUP BY time(1h)",
    )
    assert all(r["mean_ghost"] is None for r in df.collect())
    # unknown GROUP BY tag: a single null-tag group, all points in it
    df = query_measurement(
        spark, tables, "SELECT count(flowRate) FROM campus_flow "
        "GROUP BY ghostTag",
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["ghostTag"] is None


def test_malformed_shapes_raise_named_errors(spark, tables):
    """Fuzz-found stack-trace leaks, each now a named InfluxQLError."""
    bad = [
        "SELECT 42 FROM campus_flow",  # literal is not a field ref
        "SELECT top(flowRate, 95.5) FROM campus_flow",  # N must be int
        "SELECT flowRate FROM /^campus\\\\/",  # trailing-backslash regex
        "SELECT flowRate FROM campus_flow WHERE buildingID =~ /(/",
        "SELECT mean(flowRate) FROM campus_flow GROUP BY time()",
        "SELECT mean(flowRate) FROM campus_flow GROUP BY time(7x)",
        # bare field next to an aggregate is the same mix error as
        # field arithmetic next to one
        "SELECT tempC, sum(flowRate) FROM campus_flow",
    ]
    for stmt in bad:
        with pytest.raises(InfluxQLError):
            query_measurement(spark, tables, stmt, now=NOW)


def test_non_rfc3339_time_literals_named_error(spark, tables):
    """ADVICE r10: datetime.fromisoformat on Python 3.11+ accepts
    forms Spark's ANSI cast rejects ('20240101', ISO week dates,
    ordinal dates) — those must fail at PLAN time with the named
    error, not leak a SparkDateTimeException from an executor. Valid
    RFC3339 forms must still both plan AND execute (the validator
    may only accept literals the cast accepts — totality both ways)."""
    bad = [
        "20240101",  # fromisoformat-ok on 3.11+, Spark cast rejects
        "2024-W01-1",  # ISO week date
        "2024-001",  # ordinal date
        "2024-01-01+05:00",  # date with zone, no time
        "2024/01/01",
        "Jan 1 2024",
    ]
    for lit in bad:
        with pytest.raises(InfluxQLError, match="invalid time literal"):
            query_measurement(
                spark, tables,
                f"SELECT flowRate FROM campus_flow WHERE time > '{lit}'",
            )
    good = [
        "2024-01-01",
        "2024-01-01 06:30",
        "2024-01-01T06:30:15",
        "2024-01-01 06:30:15.123456",
        "2024-01-01T06:30:15.123456789Z",  # ns fraction trimmed to µs
        "2024-01-01 06:30:15+05:00",
    ]
    for lit in good:
        query_measurement(
            spark, tables,
            f"SELECT flowRate FROM campus_flow WHERE time > '{lit}'",
        ).collect()  # collect: the cast must survive execution too
    # shape ok but field range bad → still the named error
    for lit in ["2024-13-01", "2024-01-32", "2024-01-01 25:00"]:
        with pytest.raises(InfluxQLError, match="invalid time literal"):
            query_measurement(
                spark, tables,
                f"SELECT flowRate FROM campus_flow WHERE time > '{lit}'",
            )


def test_delete_with_unknown_tag_deletes_nothing(spark, tmp_path):
    """DELETE/DROP SERIES WHERE <unknown tag> must remove no points
    (InfluxDB semantics) rather than leak an unresolved-column error
    from the rewrite."""
    import datetime as dt2

    from ciws_server_spark.sources import sinks

    td = str(tmp_path)
    df = spark.createDataFrame(
        [(dt2.datetime(2024, 1, 1, 6), "A", 1.0)],
        "time timestamp, buildingID string, flowRate double",
    )
    sinks.append_points(df, td, "campus_flow")
    tab = sinks.load_tables(spark, td)
    assert (
        run_influxql(
            spark, tab, "DELETE FROM campus_flow WHERE ghost = 'x'",
            table_dir=td,
        )
        == 0
    )
    assert (
        run_influxql(
            spark, tab,
            "DROP SERIES FROM campus_flow WHERE ghost = 'x'",
            table_dir=td,
        )
        == 0
    )
    assert sinks.read_table(spark, td, "campus_flow").count() == 1


def test_translatable_statement_roundtrips_through_plan(spark, tables):
    """Deterministic spot set: classic valid compositions must come
    back as resolvable DataFrames (not just not-crash)."""
    good = [
        "SELECT flowRate FROM campus_flow",
        "SELECT mean(flowRate) FROM campus_flow GROUP BY time(1h)",
        "SELECT mean(flowRate), max(tempC) FROM campus_flow "
        "WHERE buildingID = 'A' AND time >= '2024-01-01' "
        "AND time < '2024-01-02' "
        "GROUP BY time(30m), buildingID fill(previous) "
        "ORDER BY time DESC LIMIT 5",
        "SELECT derivative(mean(flowRate), 1m) FROM campus_flow "
        "GROUP BY time(10m)",
        "SELECT mean(flowRate) + max(tempC) AS combo FROM campus_flow "
        "GROUP BY time(1h)",
        "SELECT flowRate FROM campus_flow, campus_flow_hourly",
        "SELECT flowRate FROM /^campus/ WHERE time >= 1704088800s",
    ]
    for stmt in good:
        df = query_measurement(spark, tables, stmt, now=NOW)
        assert df.columns
