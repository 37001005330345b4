"""Multi-writer contract on the snapshot-compaction protocol
(round 9; compact_table docstring, README 'Transactional tables').

Three guarantees under concurrency:
* compactor vs compactor — a second compact_table on the same table
  fails fast with CompactorBusy (non-blocking flock held for the run);
* writer vs compactor — a mutation committed during the rewrite makes
  the compactor ABORT its swap (ConcurrentAppendDetected), drop the
  rewritten snapshot, and leave the live table untouched; a retry with
  no interference succeeds and preserves every row;
* writer latency — appends block only on the compactor's short
  exclusive validate+swap sections, never on the rewrite, and a writer
  holding the shared lock delays the swap until it commits.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import threading
import time

import pytest

from ciws_server_spark.sources import sinks


def _mk_table(spark, table_dir: str, n_appends: int = 3) -> str:
    for i in range(n_appends):
        df = spark.createDataFrame(
            [
                (dt.datetime(2021, 3, 1, 0, i), "A", float(i)),
                (dt.datetime(2021, 3, 2, 0, i), "B", float(10 + i)),
            ],
            "time TIMESTAMP, buildingID STRING, hotOutFlowRate DOUBLE",
        )
        sinks.append_points(df, table_dir, "campus_flow")
    return os.path.join(table_dir, "campus_flow")


def _rows(spark, root) -> list:
    return sorted(
        (str(r["time"]), r["buildingID"], r["hotOutFlowRate"])
        for r in spark.read.parquet(root).collect()
    )


def test_second_compactor_fails_fast(spark, tmp_path):
    """compactor-vs-compactor: while one holds the compaction lock,
    another raises CompactorBusy immediately instead of double-
    rewriting or deadlocking."""
    table_dir = str(tmp_path / "tables")
    root = _mk_table(spark, table_dir)
    with sinks._flock(
        sinks._lock_file(root, "compact"), exclusive=True, blocking=False
    ):
        with pytest.raises(sinks.CompactorBusy):
            sinks.compact_table(spark, table_dir, "campus_flow")
    # lock released (flock dies with its holder) → compaction proceeds
    assert sinks.compact_table(spark, table_dir, "campus_flow") == 2


def test_crashed_compactor_leaves_no_stale_lock(spark, tmp_path):
    """flock is released when the holder's fd closes (process death
    included) — no TTL, no pidfile staleness. Simulate the crash by
    letting the lock context die, then compact normally."""
    table_dir = str(tmp_path / "tables")
    root = _mk_table(spark, table_dir)
    fd = os.open(sinks._lock_file(root, "compact"), os.O_CREAT | os.O_RDWR)
    import fcntl

    fcntl.flock(fd, fcntl.LOCK_EX)
    os.close(fd)  # the "crash": kernel releases the lock
    assert sinks.compact_table(spark, table_dir, "campus_flow") == 2


def test_concurrent_mutation_aborts_swap(spark, tmp_path, monkeypatch):
    """writer-vs-compactor: a mutation landing between the compactor's
    file-set capture and its validate+swap must abort the swap — the
    rewritten snapshot would otherwise publish without (append) or
    with (delete) rows the table no longer has.

    Injected deterministically: wrap _visible_file_set so the
    VALIDATION capture is preceded by dropping one date partition
    (what a concurrent retention_delete commits — run lock-free here
    precisely to model an uncooperative out-of-band mutator, which the
    file-set check must still catch)."""
    table_dir = str(tmp_path / "tables")
    root = _mk_table(spark, table_dir)
    sinks.compact_table(spark, table_dir, "campus_flow")  # snapshot layout
    assert os.path.islink(root)
    version_before = os.readlink(root)

    real_capture = sinks._visible_file_set
    calls = {"n": 0}

    def racing_capture(r):
        calls["n"] += 1
        if calls["n"] == 2:  # the validate capture
            import shutil

            shutil.rmtree(
                os.path.join(root, "buildingID=B", "date=2021-03-02")
            )
        return real_capture(r)

    monkeypatch.setattr(sinks, "_visible_file_set", racing_capture)
    with pytest.raises(sinks.ConcurrentAppendDetected):
        sinks.compact_table(spark, table_dir, "campus_flow")
    monkeypatch.undo()

    # swap aborted: live table still points at the old version, the
    # rewritten snapshot was dropped (no version NEWER than the live
    # one remains — retained OLDER versions are reader-grace history,
    # r13 snapshot isolation), and the table reflects the delete —
    # nothing resurrected
    assert os.path.islink(root) and os.readlink(root) == version_before
    live = os.path.join(os.path.dirname(root), os.readlink(root))
    assert live in sinks._version_dirs(root)
    assert all(d <= live for d in sinks._version_dirs(root))
    rows = _rows(spark, root)
    assert len(rows) == 3 and all(b == "A" for _, b, _ in rows)

    # a clean retry (no interference) compacts what is actually there
    assert sinks.compact_table(spark, table_dir, "campus_flow") == 1
    assert _rows(spark, root) == rows


def test_append_during_rewrite_aborts_then_retry_keeps_all_rows(
    spark, tmp_path, monkeypatch
):
    """The append flavor of the race: a cooperative append commits
    while the rewrite is running (it never blocks on the rewrite —
    only on the swap instants). The compactor must NOT publish its
    stale snapshot; after the abort + retry, every row (original AND
    concurrent) is present — the no-lost-update property."""
    table_dir = str(tmp_path / "tables")
    root = _mk_table(spark, table_dir)
    rows0 = _rows(spark, root)

    extra = spark.createDataFrame(
        [(dt.datetime(2021, 3, 3), "C", 99.0)],
        "time TIMESTAMP, buildingID STRING, hotOutFlowRate DOUBLE",
    )
    real_flock = sinks._flock
    calls = {"write_ex": 0}

    def racing_flock(path, exclusive, blocking=True):
        # the compactor's write-lock EX acquisitions: #1 = initial
        # capture, #2 = validate+swap. Fire a REAL locked append just
        # BEFORE it acquires #2 — i.e. while the rewrite result is
        # about to be validated — exactly the interleaving a
        # cooperative writer produces (it never blocks on the rewrite
        # itself, only on the swap instants).
        if path.endswith(".write.lock") and exclusive:
            calls["write_ex"] += 1
            if calls["write_ex"] == 2:
                sinks.append_points(extra, table_dir, "campus_flow")
        return real_flock(path, exclusive, blocking)

    monkeypatch.setattr(sinks, "_flock", racing_flock)
    with pytest.raises(sinks.ConcurrentAppendDetected):
        sinks.compact_table(spark, table_dir, "campus_flow")
    monkeypatch.undo()

    want = sorted(rows0 + [("2021-03-03 00:00:00", "C", 99.0)])
    assert _rows(spark, root) == want  # appended row live, none lost
    sinks.compact_table(spark, table_dir, "campus_flow")
    assert _rows(spark, root) == want  # retry publishes everything


def test_writer_holding_shared_lock_delays_swap(spark, tmp_path):
    """A writer mid-append (shared lock held) delays the compactor's
    exclusive validate+swap until it finishes; the compactor then
    completes normally. Generous sleep so the ordering assertion is
    robust under load."""
    table_dir = str(tmp_path / "tables")
    _mk_table(spark, table_dir)

    release_at = {}
    hold = 1.5

    def slow_writer():
        with sinks.table_write_lock(table_dir, "campus_flow"):
            time.sleep(hold)
            release_at["t"] = time.monotonic()

    w = threading.Thread(target=slow_writer)
    w.start()
    time.sleep(0.2)  # writer is inside its critical section
    n = sinks.compact_table(spark, table_dir, "campus_flow")
    done_at = time.monotonic()
    w.join()
    assert n == 2
    # the swap could not have completed before the writer released
    assert done_at >= release_at["t"]


def test_visible_file_set_ignores_spark_temporaries(tmp_path):
    """The conflict check must see exactly what Spark's listing sees:
    _temporary commit dirs, _SUCCESS markers, and dotfiles are not
    data, so an in-flight (uncommitted) write or a marker file must
    not flip the validation."""
    root = tmp_path / "t"
    (root / "date=2021-03-01").mkdir(parents=True)
    (root / "date=2021-03-01" / "part-000.parquet").write_bytes(b"x" * 10)
    base = sinks._visible_file_set(str(root))
    assert base == {(os.path.join("date=2021-03-01", "part-000.parquet"), 10)}

    (root / "_temporary" / "0").mkdir(parents=True)
    (root / "_temporary" / "0" / "part-001.parquet").write_bytes(b"y")
    (root / "_SUCCESS").write_bytes(b"")
    (root / "date=2021-03-01" / ".part-000.parquet.crc").write_bytes(b"c")
    assert sinks._visible_file_set(str(root)) == base
