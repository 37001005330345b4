"""Stateful streaming operators: the session-gap derived rate (A5).

Batch form: operators/timeseries.ts_derived_rate (lag window). This
module is the streaming form the reference's per-building state
machine implies (``get_hot_intake_interval.py:103-147``): per key,
remember the last pulse time across micro-batches and emit
``rate = 60 / (elapsed_seconds + 1)`` on each closing pulse
(bug-compatible ``+1`` per SURVEY.md §7.4.1).

Two implementations:

* ``derived_rate_stream`` — ``applyInPandasWithState``: one GroupState
  per key holding the last pulse timestamp. State size is O(keys),
  not O(events); shuffle is the normal groupBy-key exchange. This is
  the general template for reference-style custom state machines.
* ``session_window_stream`` — watermarked built-in
  ``session_window`` aggregation: the declarative route when
  gap-session semantics are acceptable (SURVEY.md §4's preferred
  disposition). Late data beyond the watermark is dropped by Spark,
  mirroring the reference's in-flight-file guard.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

def rate_schema(key: str = "user_id", key_type=None) -> StructType:
    """Output schema of the derived-rate operator for any key column
    (long user_id for the events table, string buildingID for the
    campus lifecycle)."""
    return StructType(
        [
            StructField(key, key_type or LongType()),
            StructField("ts", TimestampType()),
            StructField("prev_ts", TimestampType()),
            StructField("elapsed_sec", DoubleType()),
            StructField("rate", DoubleType()),
        ]
    )


RATE_SCHEMA = rate_schema()

_STATE_SCHEMA = StructType([StructField("last_ts_us", LongType())])


def _emit_pairs(
    key_name: str, key_value, timestamps, last_us: int | None
) -> tuple[list[dict], int | None]:
    """Shared pairing core: consecutive pulses → rate rows."""
    out_rows: list[dict] = []
    for ts in timestamps:
        ts_us = int(pd.Timestamp(ts).value // 1000)
        if last_us is not None:
            elapsed = (ts_us - last_us) / 1e6 + 1.0
            out_rows.append(
                {
                    key_name: key_value,
                    "ts": pd.Timestamp(ts_us * 1000),
                    "prev_ts": pd.Timestamp(last_us * 1000),
                    "elapsed_sec": round(elapsed, 6),
                    "rate": round(60.0 / elapsed, 6),
                }
            )
        last_us = ts_us
    return out_rows, last_us


def _sorted_ts(pdf: pd.DataFrame) -> pd.Series:
    """Pulse order within a group: (ts, event_id) when the tiebreaker
    column is present — the same total order the batch lag-window
    operator uses (``timeseries.ts_derived_rate`` orders by ts,
    event_id), so timestamp ties pair deterministically on both paths
    instead of in input-partition order."""
    order = ["ts", "event_id"] if "event_id" in pdf.columns else ["ts"]
    return pdf.sort_values(order)["ts"]


def _make_rate_fn(key_name: str, out_cols: list[str]):
    """applyInPandasWithState body for one key column: pair
    consecutive pulses, carrying the last pulse timestamp across
    micro-batches in GroupState."""

    def rate_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_value,) = key
        last_us = state.get[0] if state.exists else None
        out_rows: list[dict] = []
        for pdf in pdfs:
            rows, last_us = _emit_pairs(
                key_name, key_value, _sorted_ts(pdf), last_us
            )
            out_rows.extend(rows)
        if last_us is not None:
            state.update((last_us,))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_cols)

    return rate_fn


def _make_rate_fn_batch(key_name: str, out_cols: list[str]):
    """Batch form of the same state machine: the whole key history is
    in one group, so state is just the running variable."""

    def rate_fn_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(columns=out_cols)
        key_value = pdf[key_name].iloc[0]
        rows, _ = _emit_pairs(key_name, key_value, _sorted_ts(pdf), None)
        return pd.DataFrame(rows, columns=out_cols)

    return rate_fn_batch


def derived_rate_stream(pulses: DataFrame, key: str = "user_id") -> DataFrame:
    """A5 streaming: consecutive-pulse rate per key with kept state.

    ``pulses``: (user_id, ts) rows already filtered to non-zero pulses
    (P8). Streaming input → ``applyInPandasWithState`` (O(keys) state,
    cross-batch carry); batch input → ``applyInPandas`` with the same
    pairing core (applyInPandasWithState is streaming-only), which is
    how the equivalence test cross-checks it against the lag-window
    batch operator.
    """
    key_type = pulses.schema[key].dataType
    schema = rate_schema(key, key_type)
    out_cols = [f.name for f in schema.fields]
    cols = [key, "ts"] + (["event_id"] if "event_id" in pulses.columns else [])
    if not pulses.isStreaming:
        return pulses.select(*cols).groupBy(key).applyInPandas(
            _make_rate_fn_batch(key, out_cols), schema=schema
        )
    return pulses.select(*cols).groupBy(key).applyInPandasWithState(
        _make_rate_fn(key, out_cols),
        outputStructType=schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stale_alert_schema(key: str = "user_id", key_type=None) -> StructType:
    return StructType(
        [
            StructField(key, key_type or LongType()),
            StructField("last_ts", TimestampType()),
            StructField("stale_after_sec", DoubleType()),
        ]
    )


def _make_staleness_fn(key_name: str, stale_ms: int, out_cols: list[str]):
    """Event-time-timeout body for the staleness monitor: every
    arriving point re-arms the key's timeout at ``last_ts + stale``;
    when the watermark passes it with no newer point, the timed-out
    invocation emits exactly one alert row and drops the state."""

    def staleness_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (last_ms,) = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        key_name: key[0],
                        "last_ts": pd.Timestamp(last_ms * 1_000_000),
                        "stale_after_sec": stale_ms / 1000.0,
                    }
                ],
                columns=out_cols,
            )
            return
        mx = None
        for pdf in pdfs:
            if len(pdf):
                m = pd.to_datetime(pdf["ts"]).max()
                mx = m if mx is None else max(mx, m)
        if mx is None:
            return
        new_ms = int(mx.value // 1_000_000)
        if state.exists:
            (last_ms,) = state.get
            new_ms = max(new_ms, last_ms)  # late data: keep newer state
        state.update((new_ms,))
        state.setTimeoutTimestamp(new_ms + stale_ms)

    return staleness_fn


def staleness_monitor_stream(
    events: DataFrame,
    stale_sec: float = 2 * 86400,
    watermark: str = "1 second",
    key: str = "user_id",
) -> DataFrame:
    """A2 as a true stream: one alert row per key whose newest point
    is older than ``stale_sec`` when the watermark passes it.

    The reference polls — a cron health check compares each host's
    newest file mtime against now-2d (``datalogger_health_check.py:
    86-94``). Here the check is EVENT-DRIVEN:
    ``applyInPandasWithState`` with ``EventTimeTimeout`` re-arms a
    per-key timeout on every point; the timed-out invocation emits the
    alert and clears the key. State is O(keys), lives in the
    checkpointed state store (alerting spans restarts and
    availableNow runs), and there is no periodic full-table scan —
    the 100 TB form of the health check. (Spark 4's
    ``transformWithStateInPandas`` timer API is the successor surface;
    its Python runner needs protobuf, unavailable in this container —
    semantics here are identical.)
    """
    key_type = events.schema[key].dataType
    schema = stale_alert_schema(key, key_type)
    out_cols = [f.name for f in schema.fields]
    return (
        events.withWatermark("ts", watermark)
        .select(key, "ts")
        .groupBy(key)
        .applyInPandasWithState(
            _make_staleness_fn(key, int(stale_sec * 1000), out_cols),
            outputStructType=schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def session_window_stream(
    events: DataFrame,
    gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked gap-session aggregation (built-in session_window).

    Streaming equivalent of operators/timeseries.ts_sessionize: late
    rows beyond the watermark are dropped; sessions close when the
    watermark passes start+gap, giving append-mode emission.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
        )
    )
