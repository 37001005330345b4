"""Point-identity dedupe (sinks.dedupe_points): InfluxDB's
last-write-wins duplicate resolution, deferred to a snapshot-protocol
maintenance rewrite.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from ciws_server_spark.sources import sinks

T0 = dt.datetime(2024, 1, 1, 6, 0)


def _append(spark, table_dir, rows, batch_id=None):
    df = spark.createDataFrame(
        rows, "time timestamp, buildingID string, flowRate double"
    )
    sinks.append_points(df, table_dir, "campus_flow", batch_id=batch_id)


def test_lexicographic_winner_without_order(spark, tmp_path):
    table_dir = str(tmp_path)
    _append(spark, table_dir, [(T0, "A", 1.0), (T0, "B", 5.0)])
    _append(spark, table_dir, [(T0, "A", 3.0), (T0, "A", 2.0)])
    root = os.path.join(table_dir, "campus_flow")
    assert spark.read.parquet(root).count() == 4
    removed = sinks.dedupe_points(spark, table_dir, "campus_flow")
    assert removed == 2
    got = {
        (r["time"], r["buildingID"]): r["flowRate"]
        for r in spark.read.parquet(root).collect()
    }
    # deterministic winner = greatest field tuple
    assert got[(T0, "A")] == 3.0
    assert got[(T0, "B")] == 5.0
    # idempotent: a second run removes nothing and leaves the table
    assert sinks.dedupe_points(spark, table_dir, "campus_flow") == 0
    assert spark.read.parquet(root).count() == 2


def test_batch_id_order_wins_over_field_value(spark, tmp_path):
    """order_by='batch_id': the later micro-batch's SMALLER field
    value must beat the earlier batch's larger one (last-write-wins,
    not max-field-wins)."""
    table_dir = str(tmp_path)
    _append(spark, table_dir, [(T0, "A", 9.0)], batch_id=1)
    _append(spark, table_dir, [(T0, "A", 2.0)], batch_id=2)
    removed = sinks.dedupe_points(
        spark, table_dir, "campus_flow", order_by="batch_id"
    )
    assert removed == 1
    root = os.path.join(table_dir, "campus_flow")
    rows = spark.read.parquet(root).collect()
    assert len(rows) == 1
    assert rows[0]["flowRate"] == 2.0
    assert rows[0]["batch_id"] == 2


def test_layout_and_locks(spark, tmp_path):
    table_dir = str(tmp_path)
    _append(
        spark, table_dir,
        [(T0, "A", 1.0), (T0, "A", 4.0),
         (dt.datetime(2024, 1, 2, 6), "B", 7.0)],
    )
    root = os.path.join(table_dir, "campus_flow")
    sinks.dedupe_points(spark, table_dir, "campus_flow")
    # tag+date partition layout preserved; snapshot symlink published
    real = os.path.realpath(root)
    assert os.path.islink(root)
    dirs = {
        os.path.relpath(d, real)
        for d, _s, files in os.walk(real)
        if any(f.endswith(".parquet") for f in files)
    }
    assert dirs == {
        "buildingID=A/date=2024-01-01",
        "buildingID=B/date=2024-01-02",
    }
    # a concurrent compactor/dedupe is refused while the lock is held
    holder = sinks._flock(
        sinks._lock_file(root, "compact"), exclusive=True, blocking=False
    )
    holder.__enter__()
    try:
        with pytest.raises(sinks.CompactorBusy):
            sinks.dedupe_points(spark, table_dir, "campus_flow")
    finally:
        holder.__exit__(None, None, None)


def test_order_by_must_be_non_key(spark, tmp_path):
    table_dir = str(tmp_path)
    _append(spark, table_dir, [(T0, "A", 1.0)])
    with pytest.raises(ValueError, match="non-key"):
        sinks.dedupe_points(
            spark, table_dir, "campus_flow", order_by="buildingID"
        )


def test_missing_table_is_noop(spark, tmp_path):
    assert sinks.dedupe_points(spark, str(tmp_path), "nope") == 0
