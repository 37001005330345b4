"""Table-append, archive and quarantine sinks (S7-S9, S11-S12).

The reference writes points to InfluxDB measurements and moves each
CSV to an archive (success) or quarantine (parse failure) directory
(``loader.py:49-66,164-193``). Spark-first equivalents:

* measurement → partitioned parquet table dir, appended with
  ``partitionBy(tag, date)`` so tag+time-range predicates prune
  partitions — the same pruning InfluxDB's tag/time indexes give
  (SURVEY.md §1.6). At 100 TB this layout is the whole game: a query
  for one site and one week touches only those directories.
* archive / quarantine moves → manifest-driven file moves. In the
  streaming form (streaming/ingest.py) archive is the file source's
  own ``cleanSource=archive``; the batch form here moves exactly the
  files the parse manifest routed, after the table append succeeds —
  the same at-least-once contract as the reference (move gated on
  write success), minus its crash-window double-ingest
  (SURVEY.md §7.4.3).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Tag + date partitioning per table (SURVEY.md §1.6 mapping).
PARTITIONING = {
    "raw_data": ["siteID", "date"],
    "qc_data": ["siteID", "date"],
    "campus_flow": ["buildingID", "date"],
    "campus_flow_hourly": ["buildingID", "date"],
    "derived_hot_intake": ["buildingID", "date"],
    "quarantine_files": [],
}


def append_points(df: DataFrame, table_dir: str, table: str) -> None:
    """S7/S8/S9 — append points to a partitioned parquet table.

    ``date`` is derived from the time column for partition pruning.
    Batch size / numeric precision knobs of the reference's line
    protocol are storage no-ops under parquet.
    """
    parts = PARTITIONING.get(table, [])
    out = df
    if "date" in parts:
        out = out.withColumn("date", F.to_date("time"))
    (
        out.write.mode("append")
        .partitionBy(*parts)
        .parquet(os.path.join(table_dir, table))
    )


def route_residential(
    points: DataFrame, manifest: DataFrame, table_dir: str
) -> dict[str, int]:
    """Raw/QC routing (S7): one parse, two partitioned appends.

    Returns per-target row counts. The split is two filtered writes of
    the same cached parse so the scan is not repeated.
    """
    points = points.cache()
    try:
        counts = {}
        for target, flag in (("raw_data", False), ("qc_data", True)):
            sub = points.where(F.col("is_qc") == flag).drop("is_qc", "src_file")
            counts[target] = sub.count()
            if counts[target]:  # empty write would leave a schemaless dir
                append_points(sub, table_dir, target)
        append_quarantine_manifest(manifest, table_dir)
        return counts
    finally:
        points.unpersist()


def append_quarantine_manifest(manifest: DataFrame, table_dir: str) -> None:
    """S12 — record quarantined files + reasons as a table."""
    bad = manifest.where(F.col("quarantine_reason").isNotNull()).select(
        "src_file", "quarantine_reason"
    )
    bad.write.mode("append").parquet(os.path.join(table_dir, "quarantine_files"))


def move_files(manifest_rows: list, archive_dir: str, quarantine_dir: str) -> dict:
    """S11/S12 — move each landed file to archive or quarantine.

    Driver-side file plumbing (same as the reference's shutil moves) —
    called with the collected manifest AFTER the table append
    succeeded. On a cluster this is an fs rename job, not data motion.
    """
    os.makedirs(archive_dir, exist_ok=True)
    os.makedirs(quarantine_dir, exist_ok=True)
    moved = {"archive": 0, "quarantine": 0}
    for row in manifest_rows:
        # _metadata.file_path is a URI: file:/x, file:///x both occur
        src = re.sub(r"^file:(//)?", "", row["src_file"])
        dest = quarantine_dir if row["quarantine_reason"] else archive_dir
        shutil.move(src, os.path.join(dest, os.path.basename(src)))
        moved["quarantine" if row["quarantine_reason"] else "archive"] += 1
    return moved


def compact_table(
    spark, table_dir: str, table: str, target_files_per_partition: int = 1
) -> int:
    """OPTIMIZE-equivalent: rewrite each partition's small files.

    Per-file streaming appends accumulate one file per micro-batch per
    partition (SURVEY.md §7.4.5's small-file hazard). Rewrites the
    table with coalesced files per partition directory and swaps it
    in atomically-enough for a single writer (rename). Returns the
    file count after compaction. On Delta this is `OPTIMIZE`; on plain
    parquet it is this rewrite.
    """
    import glob

    root = os.path.join(table_dir, table)
    if not os.path.isdir(root):
        return 0
    parts = PARTITIONING.get(table, [])
    df = spark.read.parquet(root)
    tmp = root + ".compact.tmp"
    writer = df.coalesce(
        max(target_files_per_partition, 1)
    ) if not parts else df.repartition(
        target_files_per_partition, *parts
    )
    (
        writer.write.mode("overwrite")
        .partitionBy(*parts)
        .parquet(tmp)
    )
    old = root + ".compact.old"
    os.rename(root, old)
    os.rename(tmp, root)
    shutil.rmtree(old)
    return len(glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True))


def retention_delete(
    spark, table_dir: str, table: str, horizon_date: str
) -> int:
    """A3 as an executable job: drop partitions older than ``horizon``.

    The reference's delete-oldest-files retention
    (``memory_manager.py:3-18``, broken as written; implemented as
    evidently intended per SURVEY.md §7.4.2). With a date-partitioned
    table, retention = deleting whole partition directories — pure
    metadata work, no rewrite of surviving data; equivalent to Delta
    ``DELETE WHERE date < horizon`` + VACUUM.
    """
    root = os.path.join(table_dir, table)
    deleted = 0
    if not os.path.isdir(root):
        return 0
    for site in os.listdir(root):
        site_dir = os.path.join(root, site)
        if not os.path.isdir(site_dir):
            continue
        for part in os.listdir(site_dir):
            if part.startswith("date=") and part[5:] < horizon_date:
                shutil.rmtree(os.path.join(site_dir, part))
                deleted += 1
    return deleted
