"""InfluxQL text front-end (SURVEY.md §2.11, §4 disposition (a)).

The reference's query language is InfluxQL; the single query shape its
code issues is projection + tag equality + closed time range
(``get_hot_intake_interval.py:117``):

    SELECT "hotOutFlowRate", "buildingID" FROM "flow"
    WHERE "buildingID" = 'A' AND time >= '...' AND time <= '...'

This module accepts that shape — plus the standard InfluxQL
time-bucket aggregation surface a tsdb user expects
(``GROUP BY time(1h)[, tag]`` with mean/sum/count/min/max/first/last,
and ``LIMIT``) — as TEXT, and translates it string-level into a
DataFrame plan. No Catalyst rule, no engine fork: the translation
targets the public DataFrame API, so Catalyst optimizes the result
exactly like a hand-written query (predicate pushdown, partition
pruning on tag/date columns).

Grammar (case-insensitive keywords):

    SELECT <item> [, <item>...]
    FROM <measurement>
    [WHERE <cond> [AND <cond>...]]
    [GROUP BY time(<N><u>) [, <tag>...]]
    [LIMIT <n>]

    item  := "col" | col | agg(col) | agg("col") | *
    agg   := mean|sum|count|min|max|first|last
    cond  := tag = 'value' | time >= 'ts' | time <= 'ts'
           | time > 'ts' | time < 'ts'
    unit  := s|m|h|d (time(1h), time(30m), ...)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class InfluxQLError(ValueError):
    pass


_QUERY_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<from>\S+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_AGG_RE = re.compile(r"^(mean|sum|count|min|max|first|last)\s*\(\s*(.+?)\s*\)$", re.I)
_COND_RE = re.compile(
    r"""^(?P<lhs>"[^"]+"|\w+)\s*(?P<op>>=|<=|>|<|=)\s*(?P<rhs>'[^']*'|\S+)$"""
)
_TIME_BUCKET_RE = re.compile(r"^time\s*\(\s*(\d+)\s*([smhd])\s*\)$", re.I)

_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def _unquote(tok: str) -> str:
    tok = tok.strip()
    if tok[:1] in "\"'" and tok[:1] == tok[-1:]:
        return tok[1:-1]
    return tok


def _agg_column(fn: str, col: str, time_col: str):
    fn = fn.lower()
    out_name = f"{fn}_{col}"
    if fn == "mean":
        return F.avg(col).alias(out_name)
    if fn == "sum":
        return F.sum(col).alias(out_name)
    if fn == "count":
        return F.count(col).alias(out_name)
    if fn == "min":
        return F.min(col).alias(out_name)
    if fn == "max":
        return F.max(col).alias(out_name)
    if fn == "first":  # earliest by time — InfluxQL semantics
        return F.min_by(col, time_col).alias(out_name)
    if fn == "last":
        return F.max_by(col, time_col).alias(out_name)
    raise InfluxQLError(f"unsupported aggregate: {fn}")


def translate(
    df: DataFrame, query: str, time_col: str = "time"
) -> DataFrame:
    """Translate one InfluxQL statement against a measurement frame.

    ``df`` is the measurement's DataFrame (the FROM name is validated
    but binding is the caller's job — pass ``tables[name]``); returns
    the translated DataFrame plan.
    """
    m = _QUERY_RE.match(query)
    if not m:
        raise InfluxQLError(f"unparseable InfluxQL: {query!r}")

    out = df
    # WHERE --------------------------------------------------------
    if m.group("where"):
        for cond in re.split(r"\s+AND\s+", m.group("where"), flags=re.I):
            cm = _COND_RE.match(cond.strip())
            if not cm:
                raise InfluxQLError(f"unsupported condition: {cond!r}")
            lhs = _unquote(cm.group("lhs"))
            rhs = _unquote(cm.group("rhs"))
            col = (
                F.col(time_col).cast("timestamp")
                if lhs.lower() == "time"
                else F.col(lhs)
            )
            val = F.lit(rhs).cast("timestamp") if lhs.lower() == "time" else F.lit(rhs)
            op = cm.group("op")
            out = out.where(
                col == val if op == "="
                else col >= val if op == ">="
                else col <= val if op == "<="
                else col > val if op == ">"
                else col < val
            )

    # GROUP BY -----------------------------------------------------
    group_cols = []
    bucket = None
    if m.group("group"):
        for g in m.group("group").split(","):
            g = g.strip()
            tb = _TIME_BUCKET_RE.match(g)
            if tb:
                n, unit = int(tb.group(1)), tb.group(2).lower()
                secs = n * _UNIT_SECONDS[unit]
                # epoch-aligned bucket start, like InfluxQL time(n)
                bucket = F.timestamp_seconds(
                    (F.unix_timestamp(F.col(time_col)) / secs).cast("long") * secs
                ).alias("time_bucket")
                group_cols.append(bucket)
            else:
                group_cols.append(F.col(_unquote(g)))

    # SELECT -------------------------------------------------------
    select_raw = [s.strip() for s in m.group("select").split(",")]
    agg_items = []
    plain_items = []
    for item in select_raw:
        am = _AGG_RE.match(item)
        if am:
            agg_items.append((_unquote(am.group(1)), _unquote(am.group(2))))
        elif item == "*":
            plain_items = None  # all columns
        else:
            plain_items.append(_unquote(item)) if plain_items is not None else None

    if agg_items:
        grouped = out.groupBy(*group_cols) if group_cols else out.groupBy()
        out = grouped.agg(
            *[_agg_column(fn, col, time_col) for fn, col in agg_items]
        )
        if bucket is not None:
            out = out.orderBy("time_bucket")
    else:
        if group_cols:
            raise InfluxQLError("GROUP BY requires aggregate select items")
        if plain_items is not None:
            # InfluxQL always returns time alongside projected fields
            cols = [time_col] + [c for c in plain_items if c != time_col]
            out = out.select(*cols)

    # LIMIT --------------------------------------------------------
    if m.group("limit"):
        out = out.limit(int(m.group("limit")))
    return out


def query_measurement(
    spark, tables: dict[str, DataFrame], query: str, time_col: str = "time"
) -> DataFrame:
    """Resolve FROM against a measurement registry and translate."""
    m = _QUERY_RE.match(query)
    if not m:
        raise InfluxQLError(f"unparseable InfluxQL: {query!r}")
    name = _unquote(m.group("from"))
    if name not in tables:
        raise InfluxQLError(f"unknown measurement: {name!r}")
    return translate(tables[name], query, time_col=time_col)
