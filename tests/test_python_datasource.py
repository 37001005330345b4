"""The ciws_feed Python Data Source (sources/datasource.py).

Covers: batch read parity with the text-scan front door, one
partition per remote file, planning-time filename pushdown (P11 as
partition pruning), the P12 in-flight guard, P13 changed-file
re-read, streaming offsets across checkpointed restarts, and
composition with the distributed residential parse.
"""

from __future__ import annotations

import os
import time

import pytest

from ciws_server_spark.sources import residential
from ciws_server_spark.sources.datasource import (
    CiwsFeedBatchReader,
    register,
)

GOOD = (
    "Site:77QC\n"
    "Datalogger:4242\n"
    "Meter:9\n"
    "Time,Pulses\n"
    "2024-01-01 00:00:00,5\n"
    "2024-01-01 00:15:00,7\n"
)
GOOD2 = (
    "Site:88\n"
    "Datalogger:4243\n"
    "Meter:9\n"
    "Time,Pulses\n"
    "2024-01-02 00:00:00,1\n"
)


@pytest.fixture()
def feed_dir(tmp_path):
    d = tmp_path / "remote"
    d.mkdir()
    (d / "a_site77.csv").write_text(GOOD)
    (d / "b_site88.CSV").write_text(GOOD2)
    (d / "notes.txt").write_text("not a csv\n")
    return str(d)


def _read(spark, root, **opts):
    register(spark)
    r = spark.read.format("ciws_feed").option("root", root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_matches_text_scan(spark, feed_dir):
    got = {
        (r.src_file, r.line)
        for r in _read(spark, feed_dir).collect()
    }
    want = {
        (os.path.basename(r.src_file), r.line)
        for r in residential.read_lines(spark, feed_dir).collect()
    }
    assert got == want and len(got) == 11


def test_one_partition_per_file(spark, feed_dir):
    df = _read(spark, feed_dir)
    assert df.rdd.getNumPartitions() == 2


def test_empty_dir_is_empty_scan(spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    assert _read(spark, str(d)).count() == 0


def test_pushdown_prunes_partitions():
    """Unit-level: accepted name predicates shrink partitions()."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        StringStartsWith,
    )

    class Opts(dict):
        pass

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        for n in ("a_1.csv", "a_2.csv", "b_1.csv"):
            with open(os.path.join(d, n), "w") as fh:
                fh.write("x\n")
        reader = CiwsFeedBatchReader(None, {"root": d})
        residual = list(
            reader.pushFilters(
                [
                    StringStartsWith(("src_file",), "a_"),
                    EqualTo(("line",), "x"),  # wrong column → residual
                    GreaterThan(("src_file",), "a"),  # unsupported type
                ]
            )
        )
        # only the src_file prefix predicate was accepted
        assert len(residual) == 2
        names = {p.name for p in reader.partitions()}
        assert names == {"a_1.csv", "a_2.csv"}


def test_pushdown_end_to_end(spark, feed_dir):
    df = _read(spark, feed_dir).where("src_file LIKE 'a\\_%'")
    rows = df.collect()
    assert {r.src_file for r in rows} == {"a_site77.csv"}
    assert len(rows) == 6


def test_inflight_guard_skips_future_mtime(spark, feed_dir):
    future = time.time() + 3600
    os.utime(os.path.join(feed_dir, "b_site88.CSV"), (future, future))
    names = {r.src_file for r in _read(spark, feed_dir).collect()}
    assert names == {"a_site77.csv"}


def test_composes_with_distributed_parse(spark, feed_dir):
    lines = _read(spark, feed_dir)
    points, manifest = residential.parse_lines(lines)
    routes = {
        r.src_file: r.target for r in manifest.collect()
    }
    assert routes == {
        "a_site77.csv": "qc_data",
        "b_site88.CSV": "raw_data",
    }
    assert points.count() == 3


def test_streaming_offsets_across_restarts(spark, feed_dir, tmp_path):
    """Two availableNow runs over one checkpoint: the second run must
    ingest only files that are new or size-changed (P13)."""
    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out: list[tuple] = []

    def run_once():
        batch_rows = []
        q = (
            spark.readStream.format("ciws_feed")
            .option("root", feed_dir)
            .load()
            .writeStream.foreachBatch(
                lambda df, _id: batch_rows.extend(
                    (r.src_file, r.line) for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return batch_rows

    first = run_once()
    assert len(first) == 11

    # no changes → empty batch
    assert run_once() == []

    # one new file + one grown file → the new file in full, the grown
    # file's APPENDED TAIL only (byte-offset delta: no line ingested
    # at the smaller size is re-emitted — exactly-once for
    # append-growing dataloggers)
    d = feed_dir
    (lambda p: open(p, "w").write(GOOD2))(os.path.join(d, "c_new.csv"))
    with open(os.path.join(d, "a_site77.csv"), "a") as fh:
        fh.write("2024-01-01 00:30:00,9\n")
    third = run_once()
    files = {f for f, _ in third}
    assert files == {"c_new.csv", "a_site77.csv"}
    # new file has 5 lines; grown file contributes exactly its 1 new line
    assert len(third) == 6
    assert ("a_site77.csv", "2024-01-01 00:30:00,9") in third

    # a SHRUNK file (upstream replace/truncate) re-ingests from byte 0:
    # the previously-ingested content no longer exists, so replaying
    # the whole new content (at-least-once) is the only sound mode
    with open(os.path.join(d, "c_new.csv"), "w") as fh:
        fh.write("Site:99\nDatalogger:1\nMeter:9\nTime,Pulses\n")
    fourth = run_once()
    assert {f for f, _ in fourth} == {"c_new.csv"}
    assert len(fourth) == 4


# ---------------------------------------------------------------- sink


def _lp_files(d):
    return sorted(
        f for f in os.listdir(d) if f.endswith(".lp") and not f.startswith(".")
    )


def test_line_protocol_batch_write_roundtrip(spark, tmp_path):
    """render_lines → ciws_line_protocol sink → parse_lines recovers
    the points (the export a real InfluxDB consumer would ingest)."""
    import datetime as dt

    from ciws_server_spark.plans.line_protocol import (
        parse_lines,
        render_lines,
    )
    from ciws_server_spark.sources.datasource import register

    register(spark)
    out = str(tmp_path / "export")
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 0), "b1", 5.0),
        (dt.datetime(2024, 1, 1, 0, 15, 0), "b 2", 7.5),
    ]
    df = spark.createDataFrame(rows, ["time", "buildingID", "rate"])
    lines = render_lines(df, "flow", ["buildingID"], ["rate"])
    lines.write.format("ciws_line_protocol").option("path", out).mode(
        "append"
    ).save()

    files = _lp_files(out)
    assert files and all(f.startswith("batch--1-") for f in files)
    back = parse_lines(spark.read.text(out + "/*.lp"))
    got = {
        (r["tags"]["buildingID"], r["fields"]["rate"])
        for r in back.collect()
    }
    assert got == {("b1", "5.0"), ("b 2", "7.5")}
    assert not os.listdir(os.path.join(out, ".staging"))


def test_line_protocol_rejects_overwrite(spark, tmp_path):
    from ciws_server_spark.sources.datasource import register

    register(spark)
    df = spark.createDataFrame([("m f=1",)], ["line"])
    import pyspark.errors

    with pytest.raises(Exception, match="append-only"):
        df.write.format("ciws_line_protocol").option(
            "path", str(tmp_path / "x")
        ).mode("overwrite").save()


def test_line_protocol_stream_writer_batches(spark, tmp_path):
    """File stream → line-protocol sink: per-micro-batch atomic
    publish under deterministic batch-<id> names; a re-run over the
    same checkpoint with no new data publishes nothing."""
    from ciws_server_spark.sources.datasource import register

    register(spark)
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.txt").write_text("m,tag=x f=1\nm,tag=y f=2\n")

    def run_once():
        q = (
            spark.readStream.format("text")
            .load(str(src))
            .selectExpr("value AS line")
            .writeStream.format("ciws_line_protocol")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = _lp_files(out)
    assert first and all(f.startswith("batch-0-") for f in first)

    run_once()  # no new data → no new files
    assert _lp_files(out) == first

    (src / "b.txt").write_text("m,tag=z f=3\n")
    run_once()
    second = [f for f in _lp_files(out) if f not in first]
    assert second and all(f.startswith("batch-1-") for f in second)
    body = "".join(
        open(os.path.join(out, f)).read() for f in _lp_files(out)
    )
    assert sorted(body.splitlines()) == [
        "m,tag=x f=1", "m,tag=y f=2", "m,tag=z f=3",
    ]


def test_line_protocol_orphaned_staging_not_published(spark, tmp_path):
    """A staging file left by a crashed attempt (write() without
    commit()) must never be published by a later successful write —
    publish renames only the files named in its commit messages."""
    from ciws_server_spark.sources.datasource import (
        CiwsLineProtocolBatchWriter,
        register,
    )

    out = str(tmp_path / "export")
    w = CiwsLineProtocolBatchWriter({"path": out})
    orphan = w.write(iter([("m f=0",)]))  # staged, never committed
    assert os.path.exists(orphan.path)

    register(spark)
    spark.createDataFrame([("m f=1",)], ["line"]).write.format(
        "ciws_line_protocol"
    ).option("path", out).mode("append").save()

    published = "".join(
        open(os.path.join(out, f)).read() for f in _lp_files(out)
    )
    assert published == "m f=1\n"
    assert os.path.exists(orphan.path)  # inert, awaiting manual sweep


def test_publish_replay_clears_stale_parts(tmp_path):
    """A replayed micro-batch may stage FEWER parts than the first
    attempt (different partitioning, parts gone empty): publish must
    first clear every batch-<id>-part-*.lp of that batch id, or the
    first attempt's higher-index files survive and duplicate points."""
    from ciws_server_spark.sources.datasource import (
        _publish,
        _stage_lines,
    )

    out = str(tmp_path / "export")
    os.makedirs(out)
    opts = {"path": out}

    first = [
        _stage_lines(opts, iter([(f"m f={i}",)])) for i in range(3)
    ]
    _publish(opts, first, batch_id=7)
    assert _lp_files(out) == [
        "batch-7-part-0.lp", "batch-7-part-1.lp", "batch-7-part-2.lp",
    ]

    # replay of batch 7 with a single non-empty part
    replay = [_stage_lines(opts, iter([("m f=0",), ("m f=1",)]))]
    _publish(opts, replay, batch_id=7)
    assert _lp_files(out) == ["batch-7-part-0.lp"]
    assert (
        open(os.path.join(out, "batch-7-part-0.lp")).read()
        == "m f=0\nm f=1\n"
    )


def test_read_between_offsets_byte_capped(feed_dir):
    """Replay of a committed batch must emit exactly the byte range
    the offsets recorded — bytes appended after the commit belong to
    a later batch, and a previously-ingested prefix is never
    re-emitted."""
    from ciws_server_spark.sources.datasource import (
        CiwsFeedStreamReader,
    )
    from pyspark.sql.types import StructType

    r = CiwsFeedStreamReader(StructType([]), {"root": feed_dir})
    size0 = os.path.getsize(os.path.join(feed_dir, "a_site77.csv"))
    with open(os.path.join(feed_dir, "a_site77.csv"), "a") as fh:
        fh.write("2024-01-01 00:30:00,9\n")
    size1 = os.path.getsize(os.path.join(feed_dir, "a_site77.csv"))
    with open(os.path.join(feed_dir, "a_site77.csv"), "a") as fh:
        fh.write("2024-01-01 00:45:00,8\n")

    # replay the middle batch: [size0, size1) = exactly the one line
    got = list(
        r.readBetweenOffsets(
            {"seen": {"a_site77.csv": size0}},
            {"seen": {"a_site77.csv": size1}},
        )
    )
    assert got == [("a_site77.csv", "2024-01-01 00:30:00,9")]


def test_partial_trailing_line_never_split(feed_dir):
    """ADVICE r10: a file that grows with an UNTERMINATED trailing
    line must not have that line split across micro-batches. The
    committed offset advances only to a b'\\n' boundary while the
    file is growing; the carried tail is flushed intact once the
    file goes quiescent (size unchanged for one batch). Also pins
    the multi-byte-UTF-8 case: the cut point lands mid-char and
    must not decode as two replacement-char fragments."""
    from ciws_server_spark.sources.datasource import CiwsFeedStreamReader
    from pyspark.sql.types import StructType

    name, path = "g_grow.csv", os.path.join(feed_dir, "g_grow.csv")
    r = CiwsFeedStreamReader(StructType([]), {"root": feed_dir})

    def read_for(off):
        rows, out = r.read(off)
        return [line for f, line in rows if f == name], out

    with open(path, "w") as fh:
        fh.write("h1\nh2\n")
    lines, off1 = read_for({"seen": {}})
    assert lines == ["h1", "h2"]

    # append a whole line + the head of a straddling line, cut MID
    # UTF-8 CHAR (first byte of é only): only the whole line is
    # emitted; the fragment — including the dangling lead byte — is
    # carried, not split
    with open(path, "ab") as fh:
        fh.write("2024-01-01 00:15:00,7\n2024-01-01 00:30:00,".encode())
        fh.write(b"\xc3")  # é is \xc3\xa9 — stop after the lead byte
    lines, off2 = read_for(off1)
    assert lines == ["2024-01-01 00:15:00,7"]

    # the tail arrives (continuation byte + rest of the row): ONE
    # intact line, no U+FFFD replacement chars from a mid-char cut
    with open(path, "ab") as fh:
        fh.write(b"\xa99\n")
    lines, off3 = read_for(off2)
    assert lines == ["2024-01-01 00:30:00,é9"]

    # a final append WITHOUT a trailing newline: carried one batch,
    # then flushed intact when the file goes quiescent
    with open(path, "a") as fh:
        fh.write("2024-01-01 00:45:00,4")
    lines, off4 = read_for(off3)
    assert lines == []
    lines, off5 = read_for(off4)
    assert lines == ["2024-01-01 00:45:00,4"]
    # fully committed: a further unchanged batch emits nothing
    lines, off6 = read_for(off5)
    assert lines == []

    # replays of every committed batch reproduce exactly what the
    # live batches emitted (deterministic restart)
    for a, b, want in [
        (off1, off2, ["2024-01-01 00:15:00,7"]),
        (off2, off3, ["2024-01-01 00:30:00,é9"]),
        (off3, off4, []),
        (off4, off5, ["2024-01-01 00:45:00,4"]),
    ]:
        got = [ln for f, ln in r.readBetweenOffsets(a, b) if f == name]
        assert got == want


def _install_fake_paramiko(monkeypatch):
    import stat as stat_mod  # noqa: F401
    import sys
    import types

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
            pass

        def connect(self, host, port=22, username=None, key_filename=None):
            pass

        def open_sftp(self):
            return FakeSFTP()

        def close(self):
            pass

    fake = types.ModuleType("paramiko")
    fake.SSHClient = FakeClient
    fake.AutoAddPolicy = lambda: "auto"
    fake.RejectPolicy = lambda: "reject"
    monkeypatch.setitem(sys.modules, "paramiko", fake)


def test_sftp_transport_wiring_batch_planning(monkeypatch, feed_dir):
    """transport=sftp builds the real SFTPTransport (stand-in paramiko)
    and the batch reader PLANS through it — listing, suffix filter,
    in-flight guard all happen on the driver where the stand-in
    lives; executor-side fetch is the same transport.fetch code the
    feeder test drives."""
    _install_fake_paramiko(monkeypatch)
    reader = CiwsFeedBatchReader(
        None,
        {
            "transport": "sftp",
            "host": "h",
            "username": "u",
            "keyfile": "k",
            "remote_dir": feed_dir,
        },
    )
    names = {p.name for p in reader.partitions()}
    assert names == {"a_site77.csv", "b_site88.CSV"}


def test_sftp_transport_streaming_end_to_end(
    monkeypatch, spark, feed_dir, tmp_path
):
    """The WHOLE streaming path over SFTP: SimpleDataSourceStreamReader
    runs on the driver, so the stand-in paramiko carries a real
    micro-batch end-to-end — list, guard, fetch, offset advance."""
    from ciws_server_spark.sources.datasource import CiwsFeedStreamReader

    _install_fake_paramiko(monkeypatch)
    reader = CiwsFeedStreamReader(
        None,
        {
            "transport": "sftp",
            "host": "h",
            "username": "u",
            "keyfile": "k",
            "remote_dir": feed_dir,
        },
    )
    rows, offset = reader.read(reader.initialOffset())
    rows = list(rows)
    assert len(rows) == 11
    assert set(offset["seen"]) == {"a_site77.csv", "b_site88.CSV"}
    # nothing new → empty batch, offset stable
    rows2, offset2 = reader.read(offset)
    assert list(rows2) == [] and offset2 == offset
    # replay of the committed range re-fetches the same lines
    replay = list(reader.readBetweenOffsets(reader.initialOffset(), offset))
    assert sorted(replay) == sorted(rows)
