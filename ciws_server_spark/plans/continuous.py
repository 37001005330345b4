"""InfluxQL continuous queries: the scheduled downsampling loop.

The reference's deployment story is an InfluxDB server where rollups
are kept fresh by continuous queries (the standard InfluxDB pattern
for the dashboards its scripts feed; the engine side of the feature —
``SELECT ... INTO ... GROUP BY time(x)`` — already exists as
:func:`..plans.influxql.execute_into`). This module adds the statement
surface and the scheduler state machine around it:

    CREATE CONTINUOUS QUERY <name> [ON <db>] BEGIN <select-into> END
    SHOW CONTINUOUS QUERIES
    DROP CONTINUOUS QUERY <name> [ON <db>]

and ``run_due_continuous_queries(spark, tables, table_dir, now)`` —
the tick a cron/driver loop calls. Per InfluxDB 1.x semantics a CQ
executes at each ``time(x)`` boundary for the buckets that closed
since it last ran; this implementation folds ALL pending buckets into
ONE execution by injecting ``time >= <last_end> AND time < <floor(now)>``
into the body's WHERE — the GROUP BY already splits the range into
per-bucket rows, so catching up after downtime costs one query, not
one query per missed bucket (the property that matters when a 100 TB
store restarts after a day offline).

Determinism contract: ``now`` is always an explicit argument — the
library never reads the wall clock, so tests and replays drive the
schedule to the second. State (the catalog + each CQ's high-water
``last_end``) lives in ``_continuous_queries.json`` under the table
dir, written atomically (tmp + rename, the sinks convention) so a
crash between executing and recording re-runs at most one window into
an append-only target — the same at-least-once story as the ingest
checkpoint.

Out of surface (named errors, consistent with the module's calendar
policy): calendar-unit CQ intervals (``time(1mo)``/``time(1y)``) —
the batch ``execute_into`` handles them, but scheduling them needs a
calendar clock and nobody rolls up 100 TB by-month incrementally
month-at-a-time; sub-second intervals.
"""

from __future__ import annotations

import json
import os
import re
from datetime import datetime, timezone

from .influxql import (
    InfluxQLError,
    _QUERY_RE,
    _split_commas,
    _TIME_BUCKET_RE,
    _unquote,
    execute_into,
)

_CREATE_CQ_RE = re.compile(
    r"^\s*CREATE\s+CONTINUOUS\s+QUERY\s+(?P<name>\"[^\"]+\"|\w+)"
    r"(?:\s+ON\s+(?P<db>\"[^\"]+\"|\w+))?"
    r"\s+BEGIN\s+(?P<body>.+?)\s+END\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_CQ_RE = re.compile(
    r"^\s*DROP\s+CONTINUOUS\s+QUERY\s+(?P<name>\"[^\"]+\"|\w+)"
    r"(?:\s+ON\s+(?P<db>\"[^\"]+\"|\w+))?\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_CQ_RE = re.compile(
    r"^\s*SHOW\s+CONTINUOUS\s+QUERIES\s*;?\s*$", re.IGNORECASE
)

_STATE_FILE = "_continuous_queries.json"

_UNIT_S = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def _state_path(table_dir: str) -> str:
    return os.path.join(table_dir, _STATE_FILE)


def _load(table_dir: str) -> dict:
    try:
        with open(_state_path(table_dir)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {}


def _store(table_dir: str, state: dict) -> None:
    tmp = _state_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    os.replace(tmp, _state_path(table_dir))  # atomic on POSIX


def _cq_interval(body_match) -> tuple[int, int]:
    """(interval_s, offset_s) from the body's GROUP BY time(...)."""
    group = body_match.group("group")
    if not group:
        raise InfluxQLError("continuous query requires GROUP BY time(...)")
    for part in _split_commas(group):
        tm = _TIME_BUCKET_RE.match(part.strip())
        if not tm:
            continue
        n, unit, off_n, off_unit = tm.groups()
        if unit.lower() in ("mo", "y") or (
            off_unit and off_unit.lower() in ("mo", "y")
        ):
            raise InfluxQLError(
                "calendar-unit continuous queries are not supported;"
                " run the INTO statement directly for month/year rollups"
            )
        interval = int(n) * _UNIT_S[unit.lower()]
        offset = int(off_n) * _UNIT_S[off_unit.lower()] if off_n else 0
        return interval, offset
    raise InfluxQLError("continuous query requires GROUP BY time(...)")


def _floor_epoch(ts: datetime, interval_s: int, offset_s: int) -> int:
    """Epoch-grid bucket floor (InfluxQL alignment: the epoch itself
    anchors every fixed-duration unit, weeks included)."""
    epoch = int(ts.replace(tzinfo=timezone.utc).timestamp())
    return ((epoch - offset_s) // interval_s) * interval_s + offset_s


def _fmt(epoch_s: int) -> str:
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _inject_time_range(body: str, m, lo: str, hi: str) -> str:
    """Return the body with ``time >= lo AND time < hi`` folded into
    its WHERE (span surgery on the already-validated match, so the
    rewrite can't disagree with what the translator will parse)."""
    clause = f"time >= '{lo}' AND time < '{hi}'"
    if m.group("where"):
        s, e = m.span("where")
        return f"{body[:s]}({body[s:e]}) AND {clause}{body[e:]}"
    s, _ = m.span("group")
    # group is guaranteed present (validated at CREATE); WHERE slots
    # immediately before "GROUP BY", whose span starts at the keyword.
    g = body.upper().rindex("GROUP BY", 0, s)
    return f"{body[:g]}WHERE {clause} {body[g:]}"


def create_continuous_query(
    statement: str, table_dir: str, now: datetime
) -> str:
    """Parse + validate a CREATE CONTINUOUS QUERY and persist it.

    The CQ starts from the bucket boundary at or before ``now`` —
    history before creation is the batch INTO statement's job, matching
    InfluxDB (CQs only run forward from creation).
    """
    cm = _CREATE_CQ_RE.match(statement)
    if not cm:
        raise InfluxQLError(f"unparseable CREATE CONTINUOUS QUERY: {statement!r}")
    name = _unquote(cm.group("name"))
    body = cm.group("body").strip()
    bm = _QUERY_RE.match(body)
    if not bm:
        raise InfluxQLError(f"unparseable CQ body: {body!r}")
    if not bm.group("into"):
        raise InfluxQLError("continuous query body must contain INTO")
    interval_s, offset_s = _cq_interval(bm)
    state = _load(table_dir)
    if name in state:
        raise InfluxQLError(f"continuous query already exists: {name!r}")
    state[name] = {
        "query": body,
        "database": _unquote(cm.group("db")) if cm.group("db") else None,
        "interval_s": interval_s,
        "offset_s": offset_s,
        "last_end": _fmt(_floor_epoch(now, interval_s, offset_s)),
    }
    _store(table_dir, state)
    return name


def drop_continuous_query(statement: str, table_dir: str) -> bool:
    dm = _DROP_CQ_RE.match(statement)
    if not dm:
        raise InfluxQLError(f"unparseable DROP CONTINUOUS QUERY: {statement!r}")
    name = _unquote(dm.group("name"))
    state = _load(table_dir)
    if name not in state:
        return False
    del state[name]
    _store(table_dir, state)
    return True


def show_continuous_queries(spark, table_dir: str):
    """SHOW CONTINUOUS QUERIES → (name, query) frame, the InfluxDB
    response shape."""
    from pyspark.sql.types import StringType, StructField, StructType

    state = _load(table_dir)
    rows = [(n, state[n]["query"]) for n in sorted(state)]
    schema = StructType(
        [
            StructField("name", StringType(), False),
            StructField("query", StringType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def run_due_continuous_queries(
    spark,
    tables: dict,
    table_dir: str,
    now: datetime,
    time_col: str = "time",
) -> dict:
    """Execute every CQ whose next bucket boundary has passed.

    Returns {name: {"buckets": n, "lo": ts, "hi": ts}} for the CQs
    that ran (empty dict if nothing was due). All pending buckets per
    CQ run as one INTO execution over the combined range. State
    advances only after the write succeeds; the target is append-only,
    so a crash between the two replays one window (at-least-once, and
    idempotent for consumers that read the latest point per bucket).
    """
    state = _load(table_dir)
    ran: dict = {}
    for name in sorted(state):
        cq = state[name]
        interval_s, offset_s = cq["interval_s"], cq["offset_s"]
        hi_epoch = _floor_epoch(now, interval_s, offset_s)
        lo = cq["last_end"]
        lo_epoch = _floor_epoch(
            datetime.strptime(lo, "%Y-%m-%d %H:%M:%S"), interval_s, offset_s
        )
        if hi_epoch <= lo_epoch:
            continue  # no closed bucket since last run
        hi = _fmt(hi_epoch)
        bm = _QUERY_RE.match(cq["query"])
        bounded = _inject_time_range(cq["query"], bm, lo, hi)
        execute_into(spark, tables, bounded, table_dir, time_col)
        cq["last_end"] = hi
        _store(table_dir, state)  # per-CQ advance: a later CQ's crash
        ran[name] = {
            "buckets": (hi_epoch - lo_epoch) // interval_s,
            "lo": lo,
            "hi": hi,
        }  # must not rewind an earlier CQ's recorded progress
    return ran
