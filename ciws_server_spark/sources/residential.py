"""Residential datalogger CSV ingest (the reference's loader path).

Input layout (reference ``loader.py:121-161``, FIXTURES.md F1): three
metadata lines (site / datalogger / meter), a ``Time,Pulses`` header
row, then data rows. The site line's optional ``QC`` suffix routes the
file to the QC table instead of Raw (``loader.py:16-19,56``; regex
``^([a-zA-Z:0# ]*)(\\d+)(QC)?`` at ``loader.py:140-145``). Files whose
metadata or body fail to parse are quarantined in full
(``loader.py:49-66``).

Spark-first design — one distributed text scan, no per-file driver
loop: every line of every file lands in one DataFrame tagged with its
source path (``input_file_name``); metadata lines are classified by
label, aggregated per file, and broadcast-joined back to the data
rows. File-level quarantine is a per-file validity aggregate. At 100 TB
of landed CSV this runs as a normal distributed scan: parsing is
codegen'd regex/split work, the only shuffle is the tiny per-file
metadata aggregate, and the join back is a broadcast.

Divergence from the reference (documented): metadata lines are
recognized by their label (``Site``/``Datalogger``/``Meter``) rather
than by physical position 1-3, because a distributed text scan has no
stable intra-file line number. Files with missing/garbled labels
quarantine exactly as positional parsing would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Reference metadata regex (loader.py:144): optional letter/":"/"0"/
#: "#"/space prefix, the numeric id, optional QC suffix.
META_ID_PATTERN = r"^([a-zA-Z:0# ]*)(\d+)(QC)?"

HEADER_LINE = "Time,Pulses"

#: Data rows start with a yyyy-mm-dd timestamp (yearfirst parsing,
#: loader.py:196-200).
_DATA_ROW_RE = r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}"


def read_lines(spark: SparkSession, landing_dir: str) -> DataFrame:
    """S1 — directory scan: every line of every ``*.csv``/``*.CSV``.

    One text scan; file identity via the hidden ``_metadata`` column
    (no per-file driver I/O).
    """
    return (
        spark.read.option("pathGlobFilter", "*.[cC][sS][vV]")
        .text(landing_dir)
        .select(
            F.col("value").alias("line"),
            F.col("_metadata.file_path").alias("src_file"),
        )
    )


def classify_lines(lines: DataFrame) -> DataFrame:
    """Tag each line: metadata kind / header / data / junk."""
    low = F.lower(F.col("line"))
    return lines.withColumn(
        "kind",
        F.when(low.startswith("site"), F.lit("site"))
        .when(low.startswith("datalogger"), F.lit("datalogger"))
        .when(low.startswith("meter"), F.lit("meter"))
        .when(F.col("line") == HEADER_LINE, F.lit("header"))
        .when(F.col("line").rlike(_DATA_ROW_RE), F.lit("data"))
        .otherwise(F.lit("junk")),
    )


def file_metadata(classified: DataFrame) -> DataFrame:
    """S3 — per-file metadata: siteID, dataloggerID, QC flag, validity.

    The aggregate is tiny (one row per file); invalid files — missing
    site/datalogger id, junk lines, malformed data rows — carry a
    ``quarantine_reason``.
    """
    line, kind = F.col("line"), F.col("kind")
    site_id = F.regexp_extract(line, META_ID_PATTERN, 2)
    site_qc = F.regexp_extract(line, META_ID_PATTERN, 3)
    two_fields = F.split(line, ",")
    bad_data_row = (kind == "data") & (
        (F.size(two_fields) != 2)
        | F.try_to_timestamp(F.get(two_fields, 0)).isNull()
        | F.get(two_fields, 1).try_cast("long").isNull()
        | (F.get(two_fields, 1).try_cast("long") < 0)
    )
    agg = classified.groupBy("src_file").agg(
        F.max(F.when(kind == "site", site_id)).alias("site_id"),
        F.max(F.when(kind == "site", site_qc == "QC")).alias("is_qc"),
        F.max(F.when(kind == "datalogger", site_id)).alias("datalogger_id"),
        F.sum((kind == "junk").cast("int")).alias("n_junk"),
        F.sum(bad_data_row.cast("int")).alias("n_bad_rows"),
        F.sum((kind == "data").cast("int")).alias("n_data_rows"),
    )
    reason = (
        F.when(
            F.col("site_id").isNull() | (F.col("site_id") == ""),
            "missing site metadata",
        )
        .when(
            F.col("datalogger_id").isNull() | (F.col("datalogger_id") == ""),
            "missing datalogger metadata",
        )
        .when(F.col("n_junk") > 0, "unparseable lines")
        .when(F.col("n_bad_rows") > 0, "malformed data rows")
        .when(F.col("n_data_rows") == 0, "no data rows")
    )
    return agg.withColumn("quarantine_reason", reason)


def parse(spark: SparkSession, landing_dir: str) -> tuple[DataFrame, DataFrame]:
    """S2 — full parse: (points, per-file manifest).

    ``points``: time, pulses, siteID, dataloggerID, is_qc, src_file —
    only rows from valid files. ``manifest``: one row per file with
    routing target or quarantine reason (drives S7/S11/S12 sinks).
    """
    return parse_lines(read_lines(spark, landing_dir))


def parse_lines(lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Parse a (line, src_file) frame — shared by batch parse() and the
    streaming foreachBatch path (streaming/ingest.py)."""
    classified = classify_lines(lines)
    meta = file_metadata(classified)
    manifest = meta.select(
        "src_file",
        "site_id",
        "datalogger_id",
        F.coalesce("is_qc", F.lit(False)).alias("is_qc"),
        "n_data_rows",
        "quarantine_reason",
        F.when(
            F.col("quarantine_reason").isNotNull(), F.lit("quarantine")
        )
        .when(F.col("is_qc"), F.lit("qc_data"))
        .otherwise(F.lit("raw_data"))
        .alias("target"),
    )
    fields = F.split(F.col("line"), ",")
    points = (
        classified.where(F.col("kind") == "data")
        .join(
            F.broadcast(manifest.where(F.col("quarantine_reason").isNull())),
            "src_file",
        )
        .select(
            F.try_to_timestamp(F.get(fields, 0)).alias("time"),
            F.get(fields, 1).try_cast("long").alias("pulses"),
            F.col("site_id").alias("siteID"),
            F.col("datalogger_id").alias("dataloggerID"),
            "is_qc",
            "src_file",
        )
    )
    return points, manifest
