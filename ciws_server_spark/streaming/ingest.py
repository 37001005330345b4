"""Streaming form of the residential CSV ingest (SURVEY.md §2.9).

The reference emulates a stream with a daily cron re-scanning a
landing directory (``doc/deployment_guide.md:253-262``), an
in-flight-file guard (mtime > job start skipped,
``transfer_manager.py:192-197``) and size-change re-downloads
(``:199-209``). Structured Streaming's file source gives all of that
natively and stronger:

* new-file discovery per trigger with a checkpointed seen-files map
  (replaces glob + size diff) — exactly-once per file;
* ``Trigger.AvailableNow`` = "process everything landed, then stop"
  (the cron contract, restart-safe mid-batch);
* ``maxFilesPerTrigger`` = backpressure (the reference's
  batch_size=2000 analog);
* crash between table write and archive move cannot double-ingest
  (the reference's known crash window, SURVEY.md §7.4.3): the
  checkpoint commits a batch exactly once, and re-processing a batch
  replays the same file set deterministically.

The per-batch body reuses the exact batch parser
(sources/residential.parse_lines) — one code path for both modes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources import residential, sinks


def stream_residential(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    archive_dir: str | None = None,
    quarantine_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start an availableNow ingest pass over the landing directory.

    Each micro-batch: parse → Raw/QC partitioned append + quarantine
    manifest → (optionally) move files to archive/quarantine dirs.
    Returns the started query; call ``awaitTermination()`` to run the
    pass to completion.
    """
    reader = (
        spark.readStream.option("pathGlobFilter", "*.[cC][sS][vV]")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    lines = reader.text(landing_dir).select(
        F.col("value").alias("line"),
        F.col("_metadata.file_path").alias("src_file"),
    )

    def process_batch(batch_df, batch_id: int) -> None:
        points, manifest = residential.parse_lines(batch_df)
        manifest = manifest.cache()
        try:
            sinks.route_residential(points, manifest, table_dir)
            if archive_dir and quarantine_dir:
                sinks.move_files(
                    manifest.select("src_file", "quarantine_reason").collect(),
                    archive_dir,
                    quarantine_dir,
                )
        finally:
            manifest.unpersist()

    return (
        lines.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "residential"))
        .trigger(availableNow=True)
        .start()
    )


def run_ingest_pass(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """One cron-equivalent ingest pass (start + await)."""
    q = stream_residential(spark, landing_dir, table_dir, checkpoint_dir, **kwargs)
    q.awaitTermination()


def stream_campus(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    building: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming form of the campus transfer-manager path (S4→S8):
    same checkpointed file source, per-batch superset-schema parse,
    campus_flow append + quarantine manifest."""
    from ..sources import campus

    reader = spark.readStream.option("pathGlobFilter", "*.[cC][sS][vV]")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    lines = reader.text(landing_dir).select(
        F.col("value").alias("line"),
        F.col("_metadata.file_path").alias("src_file"),
    )

    def process_batch(batch_df, batch_id: int) -> None:
        points, manifest = campus.parse_lines(batch_df, building)
        if points.limit(1).count():
            sinks.append_points(
                points.drop("src_file"), table_dir, "campus_flow"
            )
        sinks.append_quarantine_manifest(manifest, table_dir)

    return (
        lines.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "campus"))
        .trigger(availableNow=True)
        .start()
    )


def run_campus_pass(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    building: str,
    **kwargs,
) -> None:
    q = stream_campus(
        spark, landing_dir, table_dir, checkpoint_dir, building, **kwargs
    )
    q.awaitTermination()
