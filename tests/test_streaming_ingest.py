"""Streaming ingest: availableNow trigger, checkpointed exactly-once
discovery, incremental pickup, checkpoint recovery (SURVEY.md §2.9)."""

from __future__ import annotations

import os

CSV1 = """Site #: 0042
Datalogger #: 0007
Meter #: 0001
Time,Pulses
2021-03-01 00:00:04,1
2021-03-01 00:00:08,2
"""

CSV2 = """Site #: 0043QC
Datalogger #: 0009
Meter #: 0001
Time,Pulses
2021-03-01 01:00:00,7
"""


def _counts(spark, table_dir):
    out = {}
    for t in ("raw_data", "qc_data"):
        p = os.path.join(table_dir, t)
        out[t] = spark.read.parquet(p).count() if os.path.isdir(p) else 0
    return out


def test_availablenow_incremental_and_recovery(spark, tmp_path):
    from ciws_server_spark.streaming.ingest import run_ingest_pass

    landing = tmp_path / "landing"
    landing.mkdir()
    table_dir = str(tmp_path / "tables")
    ckpt = str(tmp_path / "ckpt")

    (landing / "a.csv").write_text(CSV1)
    run_ingest_pass(spark, str(landing), table_dir, ckpt)
    assert _counts(spark, table_dir) == {"raw_data": 2, "qc_data": 0}

    # Re-running the same pass must not double-ingest (checkpointed
    # seen-files map — the reference's crash-window bug fixed).
    run_ingest_pass(spark, str(landing), table_dir, ckpt)
    assert _counts(spark, table_dir) == {"raw_data": 2, "qc_data": 0}

    # A newly landed file is picked up incrementally.
    (landing / "b.csv").write_text(CSV2)
    run_ingest_pass(spark, str(landing), table_dir, ckpt)
    assert _counts(spark, table_dir) == {"raw_data": 2, "qc_data": 1}


def test_replay_after_crash_between_append_and_commit(spark, tmp_path):
    """Kill the query AFTER the table write but BEFORE the checkpoint
    commit, restart, and assert zero duplicate rows: the batch replays
    (foreachBatch is at-least-once) but its overwrite-by-batch write
    converges instead of appending twice — the reference's crash
    window (loader.py:68-84) closed for table contents."""
    import pytest

    from ciws_server_spark.sources import sinks
    from ciws_server_spark.streaming.ingest import run_ingest_pass

    landing = tmp_path / "landing"
    landing.mkdir()
    table_dir = str(tmp_path / "tables")
    ckpt = str(tmp_path / "ckpt")
    (landing / "a.csv").write_text(CSV1)

    real_route = sinks.route_residential
    crashed = {"done": False}

    def route_then_crash(*args, **kwargs):
        out = real_route(*args, **kwargs)  # the append fully succeeds
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before checkpoint commit")
        return out

    sinks.route_residential = route_then_crash
    try:
        with pytest.raises(Exception, match="injected crash"):
            run_ingest_pass(spark, str(landing), table_dir, ckpt)
        # data landed but the batch is uncommitted
        assert _counts(spark, table_dir) == {"raw_data": 2, "qc_data": 0}
        # restart: the same batch replays and must converge, not append
        run_ingest_pass(spark, str(landing), table_dir, ckpt)
    finally:
        sinks.route_residential = real_route
    assert _counts(spark, table_dir) == {"raw_data": 2, "qc_data": 0}


def test_crash_after_commit_still_moves_files(spark, tmp_path):
    """Crash AFTER the batch commits but before any file moves: the
    next pass replays pending moves from the ingest manifest (moves
    are at-least-once, post-commit)."""
    from ciws_server_spark.streaming.ingest import run_ingest_pass

    landing = tmp_path / "landing"
    landing.mkdir()
    table_dir = str(tmp_path / "tables")
    ckpt = str(tmp_path / "ckpt")
    (landing / "a.csv").write_text(CSV1)

    # pass WITHOUT move dirs = commit happened, moves never ran
    run_ingest_pass(spark, str(landing), table_dir, ckpt)
    assert os.listdir(landing) == ["a.csv"]

    # next pass (no new files, batch already committed) heals the moves
    run_ingest_pass(
        spark,
        str(landing),
        table_dir,
        ckpt,
        archive_dir=str(tmp_path / "archive"),
        quarantine_dir=str(tmp_path / "quarantine"),
    )
    assert os.listdir(landing) == []
    assert os.listdir(tmp_path / "archive") == ["a.csv"]
    # the committed file was not re-ingested
    assert _counts(spark, table_dir) == {"raw_data": 2, "qc_data": 0}


def test_archive_and_quarantine_moves(spark, tmp_path):
    from ciws_server_spark.streaming.ingest import run_ingest_pass

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "good.csv").write_text(CSV1)
    (landing / "bad.csv").write_text("garbage\nmore garbage\n")
    table_dir = str(tmp_path / "tables")

    run_ingest_pass(
        spark,
        str(landing),
        table_dir,
        str(tmp_path / "ckpt"),
        archive_dir=str(tmp_path / "archive"),
        quarantine_dir=str(tmp_path / "quarantine"),
    )
    assert os.listdir(tmp_path / "archive") == ["good.csv"]
    assert os.listdir(tmp_path / "quarantine") == ["bad.csv"]
    assert os.listdir(landing) == []
