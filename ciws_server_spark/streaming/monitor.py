"""Ops plane: liveness monitoring + alert side-outputs (A2, S13).

The reference's health check alerts when a datalogger's newest file is
older than 2 days (``datalogger_health_check.py:86-94`` — implemented
as evidently intended; the original crashes on a string's mtime) and
POSTs errors to a Slack webhook (``transfer_manager.py:233-246``).

Engine equivalents:

* ``staleness_alerts`` — the per-key staleness aggregate as a
  DataFrame (usable in batch or per micro-batch in foreachBatch).
* ``AlertSink`` — pluggable notifier: alerts append to a parquet
  table; an optional callable receives each alert batch (the Slack
  POST stays out-of-engine, injected — same separation the reference
  uses).
* ``ProgressLog`` — StreamingQueryListener recording per-batch
  progress (rows/sec, batch duration) to a JSONL file: the
  monitoring hook §2.9 calls for.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

DEFAULT_STALE_SEC = 2 * 86400  # reference SLO: 2 days


def staleness_alerts(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    stale_sec: float = DEFAULT_STALE_SEC,
    now=None,
) -> DataFrame:
    """Keys whose newest point is older than ``stale_sec``.

    ``now`` defaults to the global max timestamp (deterministic for
    tests/backfills); pass ``F.current_timestamp()`` for wall-clock
    liveness. The global max is a 1-row broadcast join, not a shuffle.
    """
    per_key = events.groupBy(key).agg(F.max(ts_col).alias("last_ts"))
    if now is None:
        ref = events.agg(F.max(ts_col).alias("now_ts"))
        per_key = per_key.crossJoin(F.broadcast(ref))
    else:
        per_key = per_key.withColumn("now_ts", now)
    staleness = F.col("now_ts").cast("double") - F.col("last_ts").cast("double")
    return (
        per_key.withColumn("staleness_sec", F.round(staleness, 6))
        .where(F.col("staleness_sec") > stale_sec)
        .select(key, "last_ts", "staleness_sec")
    )


class AlertSink:
    """S13 — alert side-output: parquet table + pluggable notifier."""

    def __init__(
        self,
        table_dir: str,
        notifier: Callable[[list[dict]], None] | None = None,
    ) -> None:
        self.path = os.path.join(table_dir, "alerts")
        self.notifier = notifier

    def send(self, alerts: DataFrame, source: str) -> int:
        out = alerts.withColumn("alert_source", F.lit(source))
        out.write.mode("append").parquet(self.path)
        rows = [r.asDict() for r in out.collect()] if self.notifier else []
        if self.notifier and rows:
            self.notifier(rows)
        return len(rows)


def webhook_notifier(url: str, timeout: float = 5.0) -> Callable[[list[dict]], None]:
    """Webhook adapter for ``AlertSink`` (S13).

    The reference POSTs ``{"text": message}`` to a Slack incoming
    webhook (``transfer_manager.py:233-246``); this returns a notifier
    callable with the same contract — one POST per alert batch, the
    human-readable summary under ``text`` plus the structured rows.
    stdlib urllib, no dependency; inject via
    ``AlertSink(dir, notifier=webhook_notifier(url))``.
    """
    import urllib.request

    def notify(alerts: list[dict]) -> None:
        lines = [
            ", ".join(f"{k}={v}" for k, v in sorted(row.items()))
            for row in alerts
        ]
        body = json.dumps(
            {"text": "\n".join(lines), "alerts": alerts}, default=str
        ).encode()
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            resp.read()

    return notify


class ProgressLog(StreamingQueryListener):
    """Append per-batch progress to JSONL (monitoring hook, §2.9)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "durationMs": dict(p.durationMs or {}),
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
