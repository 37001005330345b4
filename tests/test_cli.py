"""python -m ciws_server_spark subcommands (the systemd/cron
deployment shells): argument wiring + one live serve round-trip."""

from __future__ import annotations

import datetime as dt
import json
import os
import threading

import pytest

from ciws_server_spark.sources import sinks


def test_tick_and_ingest_pass(spark, tmp_path, monkeypatch):
    from ciws_server_spark import __main__ as cli

    # route get_spark to the test session (no second JVM)
    monkeypatch.setattr(
        "ciws_server_spark.session.get_spark", lambda *a, **k: spark
    )
    td = str(tmp_path / "tables")
    os.makedirs(td)
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 6), "A", 1.0)],
        "time timestamp, buildingID string, flowRate double",
    )
    sinks.append_points(df, td, "campus_flow")
    assert cli.main(["tick", "--tables", td]) == 0

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "site1_dl1.csv").write_text(
        '"Site: site1"\n"Datalogger: dl1"\n"Meter: m1"\n'
        "Time,Pulses\n2024-01-01 06:00:00,5\n"
    )
    rc = cli.main(
        [
            "ingest-pass",
            "--tables", td,
            "--landing", str(landing),
            "--checkpoint", str(tmp_path / "ck"),
        ]
    )
    assert rc == 0


def test_serve_round_trip(spark, tmp_path, monkeypatch):
    import http.client

    from ciws_server_spark.sources.http_api import InfluxHTTPApi, serve

    td = str(tmp_path / "tables")
    os.makedirs(td)
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 6), "A", 4.0)],
        "time timestamp, buildingID string, flowRate double",
    )
    sinks.append_points(df, td, "campus_flow")
    srv = serve(InfluxHTTPApi(spark, td))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request(
            "GET", "/query?q=SELECT+flowRate+FROM+campus_flow"
        )
        body = json.loads(conn.getresponse().read())
        assert body["results"][0]["series"][0]["values"][0][1] == 4.0
    finally:
        srv.shutdown()
        srv.server_close()
