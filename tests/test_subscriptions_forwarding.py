"""Subscription write-forwarding (streaming/subscriptions.py): each
write batch is rendered to line protocol and delivered to the
registered destinations — executor-side, no driver collect."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest

from ciws_server_spark.plans.influxql import run_influxql
from ciws_server_spark.streaming.subscriptions import (
    batch_destinations,
    forward_batch,
    subscription_forwarder,
)


@pytest.fixture()
def batch(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 6, 0), "A", 2.0),
        (dt.datetime(2024, 1, 1, 6, 30), "A", 4.0),
        (dt.datetime(2024, 1, 1, 7, 0), "B", 6.0),
    ]
    return spark.createDataFrame(
        rows, "time timestamp, buildingID string, flowRate double"
    )


def _mk_sub(spark, batch, table_dir, name, mode, dests):
    run_influxql(
        spark,
        {"campus_flow": batch},
        f'CREATE SUBSCRIPTION "{name}" ON ciws."autogen" '
        f"DESTINATIONS {mode} "
        + ", ".join(f"'{d}'" for d in dests),
        table_dir=table_dir,
    )


def _lines(dest_dir):
    out = []
    for p in sorted(glob.glob(os.path.join(dest_dir, "*.lp"))):
        with open(p) as fh:
            out.extend(s for s in fh.read().splitlines() if s)
    return out


def test_forward_all_posts_every_destination(spark, batch, tmp_path):
    table_dir = str(tmp_path / "store")
    os.makedirs(table_dir)
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    _mk_sub(
        spark, batch, table_dir, "s0", "ALL",
        [f"file://{d1}", f"file://{d2}"],
    )
    res = forward_batch(
        batch,
        0,
        table_dir=table_dir,
        measurement="campus_flow",
        tag_cols=["buildingID"],
        field_cols=["flowRate"],
    )
    assert res["destinations"] == 2
    assert res["lines"] == 6  # 3 rows × 2 destinations
    for d in (d1, d2):
        got = _lines(d)
        assert len(got) == 3
        assert any(
            s.startswith("campus_flow,buildingID=A flowRate=2.0")
            for s in got
        )


def test_forwarded_lines_reparse(spark, batch, tmp_path):
    table_dir = str(tmp_path / "store")
    os.makedirs(table_dir)
    d1 = str(tmp_path / "d1")
    _mk_sub(spark, batch, table_dir, "s0", "ALL", [f"file://{d1}"])
    forward_batch(
        batch,
        0,
        table_dir=table_dir,
        measurement="campus_flow",
        tag_cols=["buildingID"],
        field_cols=["flowRate"],
    )
    from ciws_server_spark.plans.line_protocol import parse_lines

    raw = spark.createDataFrame(
        [(s,) for s in _lines(d1)], "value string"
    )
    parsed = parse_lines(raw).collect()
    assert len(parsed) == 3
    assert {r["measurement"] for r in parsed} == {"campus_flow"}
    assert sorted(r["tags"]["buildingID"] for r in parsed) == [
        "A", "A", "B",
    ]


def test_any_mode_round_robin_and_dedup(spark, batch, tmp_path):
    table_dir = str(tmp_path / "store")
    os.makedirs(table_dir)
    urls = ["file:///x1", "file:///x2"]
    _mk_sub(spark, batch, table_dir, "lb", "ANY", urls)
    from ciws_server_spark.plans.admin import _subs_load

    subs = _subs_load(table_dir)
    assert batch_destinations(subs, 0) == ["file:///x1"]
    assert batch_destinations(subs, 1) == ["file:///x2"]
    assert batch_destinations(subs, 2) == ["file:///x1"]
    # two subscriptions naming the same endpoint post once: "dup"
    # (ALL on x1) + "lb" (ANY picking x1 at batch 0) dedupe to one x1
    _mk_sub(spark, batch, table_dir, "dup", "ALL", ["file:///x1"])
    subs = _subs_load(table_dir)
    assert batch_destinations(subs, 0) == ["file:///x1"]
    assert batch_destinations(subs, 1) == ["file:///x1", "file:///x2"]


def test_no_subscriptions_is_noop(spark, batch, tmp_path):
    table_dir = str(tmp_path / "store")
    os.makedirs(table_dir)
    res = forward_batch(
        batch,
        0,
        table_dir=table_dir,
        measurement="campus_flow",
        tag_cols=["buildingID"],
        field_cols=["flowRate"],
    )
    assert res == {"destinations": 0, "posts": 0, "lines": 0}


def test_foreachbatch_adapter(spark, batch, tmp_path):
    table_dir = str(tmp_path / "store")
    os.makedirs(table_dir)
    d1 = str(tmp_path / "d1")
    _mk_sub(spark, batch, table_dir, "s0", "ALL", [f"file://{d1}"])
    hook = subscription_forwarder(
        table_dir=table_dir,
        measurement="campus_flow",
        tag_cols=["buildingID"],
        field_cols=["flowRate"],
    )
    r0 = hook(batch, 0)
    r1 = hook(batch, 1)
    assert r0["lines"] == r1["lines"] == 3
    # both batches landed as separate files (batch id in the name)
    assert len(_lines(d1)) == 6


def test_streaming_line_protocol_forwards(spark, tmp_path):
    """End-to-end: .lp files land → streaming ingest appends the
    table AND forwards each accepted write batch to the registered
    subscription destination."""
    import glob as _glob

    from ciws_server_spark.sources import sinks
    from ciws_server_spark.streaming.ingest import run_line_protocol_pass

    landing = tmp_path / "landing"
    landing.mkdir()
    table_dir = str(tmp_path / "store")
    os.makedirs(table_dir)
    dest = str(tmp_path / "dest")
    run_influxql(
        spark,
        {},
        f'CREATE SUBSCRIPTION "all0" ON ciws."autogen" '
        f"DESTINATIONS ALL 'file://{dest}'",
        table_dir=table_dir,
    )
    (landing / "a.lp").write_text(
        "campus_flow,buildingID=A hotOutFlowRate=2.5 1704085200000000000\n"
        "campus_flow,buildingID=B hotOutFlowRate=7.5 1704085260000000000\n"
    )
    run_line_protocol_pass(
        spark,
        str(landing),
        table_dir,
        str(tmp_path / "ck"),
        {"campus_flow": {"hotOutFlowRate": "double"}},
        forward_subscriptions=True,
    )
    assert sinks.read_table(spark, table_dir, "campus_flow").count() == 2
    lines = []
    for p in sorted(_glob.glob(os.path.join(dest, "*.lp"))):
        with open(p) as fh:
            lines += [s for s in fh.read().splitlines() if s]
    assert len(lines) == 2
    assert any("buildingID=A" in s and "hotOutFlowRate=2.5" in s
               for s in lines)
