"""Ops-plane streaming monitor: staleness alerts, alert sink with
pluggable notifier, per-batch progress log (S13, A2, §2.9 monitoring)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def test_staleness_alerts_matches_query_operator(spark, sf_smoke):
    from ciws_server_spark.operators.timeseries import ts_stale_users
    from ciws_server_spark.streaming.monitor import staleness_alerts
    from ciws_server_spark.tables import table

    ev = table(spark, sf_smoke, "events")
    got = {
        r["user_id"]
        for r in staleness_alerts(ev, key="user_id", ts_col="ts").collect()
    }
    exp = {r["user_id"] for r in ts_stale_users(spark, sf_smoke).collect()}
    assert got == exp


def test_alert_sink_writes_table_and_notifies(spark, tmp_path):
    from ciws_server_spark.streaming.monitor import AlertSink

    received = []
    sink = AlertSink(str(tmp_path), notifier=received.append)
    alerts = spark.createDataFrame(
        [("pi-a", 200000.5)], ["host", "staleness_sec"]
    )
    n = sink.send(alerts, source="health-check")
    assert n == 1
    assert received[0][0]["host"] == "pi-a"
    stored = spark.read.parquet(os.path.join(str(tmp_path), "alerts"))
    row = stored.collect()[0]
    assert row["alert_source"] == "health-check"


def test_progress_log_listener(spark, tmp_path):
    from ciws_server_spark.streaming.monitor import ProgressLog

    log_path = str(tmp_path / "progress.jsonl")
    listener = ProgressLog(log_path)
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "src"
        spark.range(10).select(
            F.col("id").alias("user_id")
        ).coalesce(1).write.parquet(str(src / "f1"))
        q = (
            spark.readStream.schema("user_id BIGINT")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
            .groupBy()
            .count()
            .writeStream.format("memory")
            .queryName("progress_probe")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously
        for _ in range(40):
            if os.path.exists(log_path) and os.path.getsize(log_path) > 0:
                break
            time.sleep(0.25)
        recs = [json.loads(line) for line in open(log_path)]
        assert recs and recs[0]["numInputRows"] == 10
        assert "durationMs" in recs[0]
    finally:
        spark.streams.removeListener(listener)


def test_webhook_notifier_posts_alert_batches(spark, tmp_path):
    """S13 end-to-end with a REAL HTTP hop: alerts flow through
    AlertSink into a webhook POST (local in-process server — the
    reference's Slack webhook shape, {"text": ...} + rows)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from ciws_server_spark.streaming.monitor import (
        AlertSink,
        staleness_alerts,
        webhook_notifier,
    )

    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            n = int(self.headers["Content-Length"])
            received.append(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_port}/hook"
    try:
        import datetime as dt

        base = dt.datetime(2021, 3, 10)
        events = spark.createDataFrame(
            [
                (1, base),                            # stale
                (2, base + dt.timedelta(days=5)),     # fresh (= now ref)
            ],
            ["user_id", "ts"],
        )
        alerts = staleness_alerts(events)
        sink = AlertSink(str(tmp_path), notifier=webhook_notifier(url))
        n = sink.send(alerts, source="staleness")
        assert n == 1
        assert len(received) == 1
        assert "user_id=1" in received[0]["text"]
        assert received[0]["alerts"][0]["alert_source"] == "staleness"
    finally:
        server.shutdown()
