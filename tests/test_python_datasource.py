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

    # one new file + one grown file → exactly those re-ingested
    d = feed_dir
    (lambda p: open(p, "w").write(GOOD2))(os.path.join(d, "c_new.csv"))
    with open(os.path.join(d, "a_site77.csv"), "a") as fh:
        fh.write("2024-01-01 00:30:00,9\n")
    third = run_once()
    files = {f for f, _ in third}
    assert files == {"c_new.csv", "a_site77.csv"}
    # grown file is re-read in full (7 lines), new file has 5
    assert len(third) == 12
