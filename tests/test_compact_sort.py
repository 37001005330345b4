"""Time-clustered compaction: ``compact_table(sort_by=["time"])``
must produce parquet files whose row groups are ordered on time, so
row-group min/max statistics become selective for time-range scans
(whole row groups skip instead of decoding — the scan-pruning payoff
of compaction at scale).
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pyarrow.parquet as pq

from ciws_server_spark.sources import sinks


def _scrambled_table(spark, table_dir):
    # three appends in shuffled time order → unsorted files on disk
    for hours in ([5, 1, 9], [3, 7, 0], [8, 2, 6]):
        rows = [
            (dt.datetime(2024, 1, 1, h, m), "A", float(h * 60 + m))
            for h in hours
            for m in range(0, 60, 5)
        ]
        df = spark.createDataFrame(
            rows, "time timestamp, buildingID string, flowRate double"
        )
        sinks.append_points(df, table_dir, "campus_flow")
    return os.path.join(table_dir, "campus_flow")


def _time_stats(root):
    """[(path, [(min, max) per row group])] for every data file."""
    out = []
    for p in sorted(
        glob.glob(
            os.path.join(os.path.realpath(root), "**", "*.parquet"),
            recursive=True,
        )
    ):
        f = pq.ParquetFile(p)
        idx = f.schema_arrow.get_field_index("time")
        spans = []
        for rg in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
        out.append((p, spans))
    return out


def test_sorted_compaction_orders_row_groups(spark, tmp_path):
    table_dir = str(tmp_path)
    root = _scrambled_table(spark, table_dir)
    sinks.compact_table(spark, table_dir, "campus_flow", sort_by=["time"])
    stats = _time_stats(root)
    assert stats, "compaction produced no files"
    for path, spans in stats:
        # within every file, row-group time ranges are non-overlapping
        # and ascending — the property min/max pruning needs
        for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
            assert hi_a <= lo_b, f"{path}: overlapping row groups"
    # rows and values survive the sorted rewrite
    df = sinks.read_table(spark, table_dir, "campus_flow")
    assert df.count() == 9 * 12


def test_sorted_compaction_composes_with_snapshot_protocol(
    spark, tmp_path
):
    table_dir = str(tmp_path)
    root = _scrambled_table(spark, table_dir)
    sinks.compact_table(spark, table_dir, "campus_flow", sort_by=["time"])
    assert os.path.islink(root)
    # a second, unsorted compaction still works and preserves rows
    sinks.compact_table(spark, table_dir, "campus_flow")
    assert sinks.read_table(spark, table_dir, "campus_flow").count() == 108
