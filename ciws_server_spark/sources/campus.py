"""Campus meter CSV ingest (the reference's transfer-manager path).

Input layout (reference ``transfer_manager.py:84-121``, FIXTURES.md
F2): one junk line, a header, then ``Date`` + either 6 sensor columns
(current schema) or 3 (legacy). The reference handles the two
generations with a try/except cascade re-reading the file; here one
permissive superset-schema parse covers both — legacy rows simply
carry nulls for the temperature columns (SURVEY.md §1.4's prescribed
replacement). ``buildingID`` is stamped from the caller (hostname
in the reference, ``transfer_manager.py:123,172``), uppercased (P6).

Same distributed shape as the residential source: one text scan,
codegen'd split/cast parsing, per-file validity aggregate, broadcast
join. No driver-side per-file loop, no schema retry I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIELDS_CURRENT = [
    "coldInFlowRate",
    "hotInFlowRate",
    "hotOutFlowRate",
    "hotInTemp",
    "hotOutTemp",
    "coldInTemp",
]
FIELDS_LEGACY = FIELDS_CURRENT[:3]

_DATA_ROW_RE = r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}"


def read_lines(spark: SparkSession, landing_dir: str) -> DataFrame:
    return (
        spark.read.option("pathGlobFilter", "*.[cC][sS][vV]")
        .text(landing_dir)
        .select(
            F.col("value").alias("line"),
            F.col("_metadata.file_path").alias("src_file"),
        )
    )


def parse(
    spark: SparkSession, landing_dir: str, building: str
) -> tuple[DataFrame, DataFrame]:
    """(points, manifest): superset-schema parse with legacy fallback.

    ``points``: time, 6 double fields (nulls for legacy rows),
    buildingID, src_file. ``manifest``: per-file row counts + schema
    generation + quarantine reason for unparseable files.
    """
    return parse_lines(read_lines(spark, landing_dir), building)


def parse_lines(lines: DataFrame, building: str) -> tuple[DataFrame, DataFrame]:
    """Parse a (line, src_file) frame — shared by batch parse() and
    the streaming foreachBatch path (streaming/ingest.py)."""
    fields = F.split(F.col("line"), ",")
    n = F.size(fields)
    is_data = F.col("line").rlike(_DATA_ROW_RE)
    is_header = F.lower(F.col("line")).startswith("date,")

    parsed = lines.select(
        "src_file",
        "line",
        is_data.alias("is_data"),
        is_header.alias("is_header"),
        n.alias("n_fields"),
        F.try_to_timestamp(F.get(fields, 0)).alias("time"),
        *[
            F.get(fields, i + 1).try_cast("double").alias(c)
            for i, c in enumerate(FIELDS_CURRENT)
        ],
    )
    # A data row is valid iff it has 7 (current) or 4 (legacy) fields,
    # the timestamp parses, and every present numeric field casts.
    present_ok = F.lit(True)
    for i, c in enumerate(FIELDS_CURRENT):
        present_ok = present_ok & (
            (F.col("n_fields") < i + 2) | F.col(c).isNotNull()
        )
    bad_data = F.col("is_data") & (
        ~F.col("n_fields").isin(4, 7) | F.col("time").isNull() | ~present_ok
    )
    junk = ~F.col("is_data") & ~F.col("is_header")

    per_file = parsed.groupBy("src_file").agg(
        F.sum(F.col("is_data").cast("int")).alias("n_data_rows"),
        F.sum(bad_data.cast("int")).alias("n_bad_rows"),
        # >1 junk line = more than the expected single preamble line
        F.sum(junk.cast("int")).alias("n_junk"),
        F.max(F.when(F.col("is_data"), F.col("n_fields"))).alias("max_fields"),
    )
    manifest = per_file.select(
        "src_file",
        "n_data_rows",
        F.when(F.col("max_fields") == 7, "current")
        .when(F.col("max_fields") == 4, "legacy")
        .alias("schema_generation"),
        F.when(F.col("n_bad_rows") > 0, "malformed data rows")
        .when(F.col("n_junk") > 1, "unparseable lines")
        .when(F.col("n_data_rows") == 0, "no data rows")
        .alias("quarantine_reason"),
    )
    points = (
        parsed.where(F.col("is_data"))
        .join(
            F.broadcast(
                manifest.where(F.col("quarantine_reason").isNull()).select(
                    "src_file"
                )
            ),
            "src_file",
        )
        .select(
            "time",
            *FIELDS_CURRENT,
            F.lit(building.upper()).alias("buildingID"),
            "src_file",
        )
    )
    return points, manifest
