"""Round-14 snapshot-protocol hardening (advisor r13 + VERDICT ask #5):

* reader LEASES — a pinned scan older than the vacuum grace window is
  kept alive by a heartbeat for as long as its DataFrame lives;
* the ``_retired_at`` sidecar — retirement time survives a failed
  ``os.utime`` stamp, so vacuum never reclaims a just-retired version
  whose dir mtime is far in the past;
* a partially failed DROP's leftover version dir is never ADOPTED by
  a later same-named CREATE (dropped rows must not resurrect).
"""

from __future__ import annotations

import datetime as dt
import gc
import os
import time

from ciws_server_spark.sources import sinks


def _mk_points(spark, vals, minute0=0):
    return spark.createDataFrame(
        [
            (dt.datetime(2024, 3, 1, 8, minute0 + i), "A", float(v))
            for i, v in enumerate(vals)
        ],
        "time timestamp, buildingID string, flowRate double",
    )


def test_reader_lease_extends_grace_for_live_scans(
    spark, tmp_path, monkeypatch
):
    """A pinned reader older than the grace window survives vacuum
    while its DataFrame is alive (the lease heartbeat keeps touching
    the retired dir), and the dir ages out normally once the reader
    is garbage-collected."""
    monkeypatch.setenv("CIWS_LEASE_INTERVAL_S", "0.2")
    td = str(tmp_path)
    sinks.append_points(_mk_points(spark, [1.0, 2.0]), td, "m")
    root = os.path.join(td, "m")

    reader = sinks.read_table(spark, td, "m")
    assert reader.count() == 2
    pinned = os.path.realpath(root)

    sinks.compact_table(spark, td, "m")
    assert os.path.realpath(root) != pinned  # v1 retired, v2 current
    assert os.path.isdir(pinned)  # retained under default grace

    # let the retirement stamp age PAST the (shrunk) grace window;
    # the lease heartbeat must keep resetting the clock
    time.sleep(1.2)
    sinks._vacuum_versions(root, grace_s=0.9)
    assert os.path.isdir(pinned), "vacuum reclaimed a leased version"
    # the pinned scan still works end-to-end
    assert reader.count() == 2

    # drop the last reference: the lease dies with the DataFrame and
    # the retired dir ages out on the next vacuum past grace.
    # The _retired_at sidecar is a retirement-time FLOOR, already
    # older than grace here; only the heartbeat was keeping it alive.
    del reader
    gc.collect()
    time.sleep(1.4)
    sinks._vacuum_versions(root, grace_s=0.9)
    assert not os.path.isdir(pinned), "unleased version not vacuumed"


def test_retirement_sidecar_survives_failed_utime(
    spark, tmp_path, monkeypatch
):
    """Advisor r13: if the retirement ``os.utime`` stamp fails, the
    dir's mtime is its last-append time — far older than grace — and
    vacuum would reclaim it immediately under pinned readers. The
    ``_retired_at`` sidecar (written before the swap) is the
    authoritative fallback clock."""
    # keep the lease heartbeat out of this test's mtime bookkeeping
    # (compact_table's internal read leases v1 until GC'd)
    monkeypatch.setenv("CIWS_LEASE_INTERVAL_S", "3600")
    td = str(tmp_path)
    sinks.append_points(_mk_points(spark, [1.0, 2.0]), td, "m")
    root = os.path.join(td, "m")
    v1 = os.path.realpath(root)

    real_utime = os.utime

    def failing_utime(path, *a, **k):
        if os.path.abspath(str(path)) == v1:
            raise OSError("simulated utime failure")
        return real_utime(path, *a, **k)

    monkeypatch.setattr(sinks.os, "utime", failing_utime)
    sinks.compact_table(spark, td, "m")
    monkeypatch.setattr(sinks.os, "utime", real_utime)

    assert os.path.isdir(v1)
    sidecar = os.path.join(v1, "_retired_at")
    assert os.path.isfile(sidecar)

    # simulate the failure mode: dir mtime = ancient last-append time
    old = time.time() - 10_000
    real_utime(v1, (old, old))
    sinks._vacuum_versions(root, grace_s=300)
    assert os.path.isdir(v1), (
        "vacuum ignored the retirement sidecar and reclaimed a "
        "just-retired version by its stale mtime"
    )

    # without the sidecar the same state ages out (pre-r14 behavior)
    os.remove(sidecar)
    gc.collect()  # drop compact_table's internal lease on v1
    real_utime(v1, (old, old))
    sinks._vacuum_versions(root, grace_s=300)
    assert not os.path.isdir(v1)


def test_drop_leftover_version_never_resurrects(spark, tmp_path):
    """Advisor r13: ``execute_drop`` removes versions with rmtree; a
    partial failure could leave one behind. A later same-named CREATE
    must start a FRESH version — adopting the leftover would silently
    resurrect dropped rows."""
    td = str(tmp_path)
    sinks.append_points(_mk_points(spark, [1.0, 2.0]), td, "m")
    root = os.path.join(td, "m")
    leftover = os.path.realpath(root)
    assert leftover.endswith(".v000001")

    # simulate execute_drop dying after the symlink removal but
    # before the version rmtree completed
    os.remove(root)
    for side in (
        sinks._schema_file(root),
        sinks._lock_file(root, "write"),
        sinks._lock_file(root, "compact"),
    ):
        if os.path.exists(side):
            os.remove(side)
    assert os.path.isdir(leftover)  # dropped data still on disk

    sinks.append_points(_mk_points(spark, [9.0], minute0=30), td, "m")
    assert os.path.realpath(root).endswith(".v000002"), (
        "re-created table adopted the dropped table's version dir"
    )
    got = [
        r["flowRate"]
        for r in sinks.read_table(spark, td, "m").collect()
    ]
    assert got == [9.0], f"dropped rows resurrected: {got}"


def test_load_tables_skips_table_dropped_mid_listing(
    spark, tmp_path, monkeypatch
):
    """r14 soak-found (CQ ticker vs DROP): a concurrent DROP can yank
    a table between load_tables' directory listing and the eager
    file-index build — the registry snapshot must simply omit the
    mid-drop table, not raise PATH_NOT_FOUND to engine callers (the
    wire path has a retry wrapper; load_tables callers don't)."""
    from pyspark.errors import AnalysisException

    td = str(tmp_path)
    sinks.append_points(_mk_points(spark, [1.0]), td, "keep_me")
    sinks.append_points(_mk_points(spark, [2.0]), td, "drop_me")

    real = sinks.read_table

    def racing_read(spark_, table_dir, table):
        if table == "drop_me":
            raise AnalysisException(
                "[PATH_NOT_FOUND] Path does not exist: "
                f"file:{td}/drop_me.v000001. SQLSTATE: 42K03"
            )
        return real(spark_, table_dir, table)

    monkeypatch.setattr(sinks, "read_table", racing_read)
    out = sinks.load_tables(spark, td)
    assert "keep_me" in out and "drop_me" not in out


def test_version_numbering_past_v999999(spark, tmp_path):
    """Version numbers parse the FULL digit run after '.v': past
    v999999 the dir name grows to 7 digits, and the old fixed-width
    ``int(name[-6:])`` wrapped the counter to 0, restarting numbering
    below existing versions (advisor r14). Both the next-version
    derivation and the 'current = highest version' ordering must hold
    across the rollover."""
    td = str(tmp_path)
    sinks.append_points(_mk_points(spark, [1.0, 2.0]), td, "m")
    root = os.path.join(td, "m")
    v_old = os.path.realpath(root)
    v999999 = root + ".v999999"
    os.rename(v_old, v999999)
    os.remove(root)
    os.symlink(os.path.basename(v999999), root)
    sinks.compact_table(spark, td, "m")
    cur = os.path.realpath(root)
    assert cur.endswith(".v1000000")
    assert sinks._v_of(cur) == 1_000_000
    dirs = sinks._version_dirs(root)
    assert dirs[-1] == cur  # numeric, not lexicographic, ordering
    assert sinks.read_table(spark, td, "m").count() == 2
