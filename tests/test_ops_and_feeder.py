"""Ops-plane operators (A1-A3, P11) + incremental feeder (S5/P12/P13)."""

from __future__ import annotations

import datetime as dt
import os
import time


def _listing(spark):
    base = dt.datetime(2021, 3, 10)
    rows = [
        # host, filename, mtime, size
        ("pi-a", "multi_meter_001.csv", base, 100),
        ("pi-a", "multi_meter_002.csv", base + dt.timedelta(days=1), 150),
        ("pi-a", "other.log", base + dt.timedelta(days=5), 10),
        ("pi-b", "multi_meter_001.csv", base - dt.timedelta(days=10), 300),
        ("pi-b", "multi_meter_000.csv", base - dt.timedelta(days=12), 200),
    ]
    return spark.createDataFrame(rows, ["host", "filename", "mtime", "size"])


def test_latest_and_stale(spark):
    from ciws_server_spark.operators.ops import latest_file_per_host, stale_hosts

    latest = {
        r["host"]: r["latest_file"]
        for r in latest_file_per_host(_listing(spark)).collect()
    }
    # prefix filter excludes other.log even though it is newest on pi-a
    assert latest == {
        "pi-a": "multi_meter_002.csv",
        "pi-b": "multi_meter_001.csv",
    }

    stale = stale_hosts(
        _listing(spark), now=dt.datetime(2021, 3, 12)
    ).collect()
    assert [r["host"] for r in stale] == ["pi-b"]
    assert stale[0]["latest_file"] == "multi_meter_001.csv"


def test_retention_file_plan(spark):
    from ciws_server_spark.operators.ops import retention_file_plan

    plan = retention_file_plan(_listing(spark), free_bytes_needed=250)
    by_host = {}
    for r in plan.collect():
        by_host.setdefault(r["host"], []).append(r["filename"])
    for host in by_host:
        by_host[host].sort()
    # pi-a: oldest-first 100+150 → second file crosses the 250 target
    assert by_host["pi-a"] == ["multi_meter_001.csv", "multi_meter_002.csv"]
    # pi-b: oldest (000, 200 bytes) then 001 crosses target
    assert by_host["pi-b"] == ["multi_meter_000.csv", "multi_meter_001.csv"]


def test_feeder_incremental(tmp_path):
    from ciws_server_spark.sources.sftp_feeder import (
        LocalDirTransport,
        sync_incremental,
    )

    remote = tmp_path / "remote"
    landing = tmp_path / "landing"
    remote.mkdir()
    (remote / "a.csv").write_text("Time,Pulses\n")
    (remote / "b.CSV").write_text("Time,Pulses\n2021-03-01 00:00:04,1\n")
    (remote / "notes.txt").write_text("ignore me")
    os.mkdir(remote / "subdir")

    t = LocalDirTransport(str(remote))
    now = time.time() + 10  # everything already landed is "old enough"

    s1 = sync_incremental(t, str(landing), job_start=now)
    assert s1 == {"fetched": 2, "skipped_inflight": 0, "skipped_unchanged": 0}

    # second pass: nothing changed → nothing re-fetched (P13)
    s2 = sync_incremental(t, str(landing), job_start=now)
    assert s2["fetched"] == 0 and s2["skipped_unchanged"] == 2

    # grow a file → size-change re-fetch (P13)
    (remote / "a.csv").write_text("Time,Pulses\n2021-03-01 00:00:08,2\n")
    s3 = sync_incremental(t, str(landing), job_start=time.time() + 10)
    assert s3["fetched"] == 1

    # in-flight guard: mtime newer than job_start → skipped (P12)
    (remote / "c.csv").write_text("Time,Pulses\n")
    os.utime(remote / "c.csv", (time.time() + 3600, time.time() + 3600))
    s4 = sync_incremental(t, str(landing), job_start=time.time() + 10)
    assert s4["skipped_inflight"] == 1
    assert not (landing / "c.csv").exists()


def test_sftp_transport_is_explicit_stub():
    import pytest

    from ciws_server_spark.sources.sftp_feeder import SFTPTransport

    with pytest.raises(NotImplementedError, match="paramiko"):
        SFTPTransport("host", "user", "key", "/data")


RES_CSV_1 = """Site #: 0042
Datalogger #: 0007
Meter #: 0001
Time,Pulses
2021-03-01 00:00:04,1
2021-03-01 00:00:08,2
"""

RES_CSV_2 = """Site #: 0042
Datalogger #: 0007
Meter #: 0001
Time,Pulses
2021-03-02 00:00:00,5
"""


def test_feeder_to_ingest_to_query_lifecycle(spark, tmp_path):
    """The reference's §3.2 lifecycle end-to-end: remote datalogger
    dir → incremental feeder → landing dir → checkpointed streaming
    ingest → partitioned table → tag+time-range query. Second feeder
    pass skips unchanged remote files AND the streaming checkpoint
    skips already-ingested landed files (both dedup layers active)."""
    import time

    import pyspark.sql.functions as F

    from ciws_server_spark.sources.sftp_feeder import (
        LocalDirTransport,
        sync_incremental,
    )
    from ciws_server_spark.streaming.ingest import run_ingest_pass

    remote = tmp_path / "datalogger"
    remote.mkdir()
    landing = tmp_path / "landing"
    table_dir = str(tmp_path / "tables")
    ckpt = str(tmp_path / "ckpt")

    (remote / "day1.csv").write_text(RES_CSV_1)
    t = LocalDirTransport(str(remote))
    s1 = sync_incremental(t, str(landing), job_start=time.time() + 10)
    assert s1["fetched"] == 1
    run_ingest_pass(spark, str(landing), table_dir, ckpt)

    raw = spark.read.parquet(os.path.join(table_dir, "raw_data"))
    assert raw.count() == 2

    # new remote file lands; old one unchanged (feeder skip); ingest
    # picks up ONLY the new file (checkpoint skip of day1)
    (remote / "day2.csv").write_text(RES_CSV_2)
    s2 = sync_incremental(t, str(landing), job_start=time.time() + 10)
    assert s2["fetched"] == 1 and s2["skipped_unchanged"] == 1
    run_ingest_pass(spark, str(landing), table_dir, ckpt)

    raw = spark.read.parquet(os.path.join(table_dir, "raw_data"))
    assert raw.count() == 3
    # S10/P9 query shape over the ingested table: tag + time range,
    # partition-pruned by (siteID, date)
    got = raw.where(
        (F.col("siteID") == "42")
        & F.col("time").between("2021-03-02 00:00:00", "2021-03-02 23:59:59")
    ).collect()
    assert [r["pulses"] for r in got] == [5]


def test_sftp_transport_import_gate():
    """Without paramiko, construction raises the documented
    NotImplementedError (honest stub behavior preserved)."""
    import pytest

    from ciws_server_spark.sources.sftp_feeder import SFTPTransport

    with pytest.raises(NotImplementedError, match="paramiko"):
        SFTPTransport("host", "user", "key", "/remote")


def test_sftp_transport_logic_with_fake_paramiko(monkeypatch, tmp_path):
    """Drive the REAL SFTPTransport code (listdir_attr mapping, atomic
    .part fetch, feeder integration) through a stand-in paramiko
    module backed by a local directory."""
    import os
    import stat as stat_mod
    import sys
    import types

    remote = tmp_path / "remote"
    remote.mkdir()
    (remote / "a.csv").write_text("x,y\n1,2\n")
    (remote / "b.csv").write_text("x,y\n3,4\n5,6\n")
    (remote / "sub").mkdir()

    class FakeAttr:
        def __init__(self, p):
            st = os.stat(p)
            self.filename = os.path.basename(p)
            self.st_mtime = st.st_mtime
            self.st_size = st.st_size
            self.st_mode = st.st_mode

    class FakeSFTP:
        def listdir_attr(self, d):
            return [FakeAttr(os.path.join(d, n)) for n in os.listdir(d)]

        def get(self, src, dst):
            import shutil

            shutil.copy2(src, dst)

        def close(self):
            pass

    class FakeClient:
        def load_system_host_keys(self):
            pass

        def set_missing_host_key_policy(self, p):
            self.policy = p

        def connect(self, host, port=22, username=None, key_filename=None):
            self.connected = (host, port, username)

        def open_sftp(self):
            return FakeSFTP()

        def close(self):
            pass

    fake = types.ModuleType("paramiko")
    fake.SSHClient = FakeClient
    fake.AutoAddPolicy = lambda: "auto"
    fake.RejectPolicy = lambda: "reject"
    monkeypatch.setitem(sys.modules, "paramiko", fake)

    from ciws_server_spark.sources.sftp_feeder import (
        SFTPTransport,
        sync_incremental,
    )

    landing = str(tmp_path / "landing")
    with SFTPTransport("h", "u", "k", str(remote)) as t:
        files = t.listdir()
        assert [f.name for f in files] == ["a.csv", "b.csv", "sub"]
        assert next(f for f in files if f.name == "sub").is_dir
        assert stat_mod.S_ISDIR  # imported mapping exercised above

        stats = sync_incremental(t, landing)
        assert stats["fetched"] == 2
        # atomic: no .part remnants, full bytes present
        assert sorted(os.listdir(landing)) == ["a.csv", "b.csv"]
        assert open(os.path.join(landing, "b.csv")).read().count("\n") == 3

        # unchanged files skipped on the next pass
        stats = sync_incremental(t, landing)
        assert stats == {
            "fetched": 0,
            "skipped_inflight": 0,
            "skipped_unchanged": 2,
        }
