"""Table access for the driver-generated synthetic datasets.

Reads are plain parquet scans so Catalyst column pruning / predicate
pushdown reach the file source. At cluster scale the same tables would
be partitioned fact tables (events by date, lineitem by ship-month);
readers here take the directory layout as-is (TESTDATA.md: one parquet
file per table per scale factor).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_conf

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table. UTC + AQE are pinned on first touch.

    ``events.ts`` arrives as parquet ``timestamp[us]`` (no timezone), so
    Spark reads it as TIMESTAMP_NTZ. Downstream epoch arithmetic
    (``functions.scalar.epoch_seconds`` = ``cast("double")``) is only
    legal on the zoned TIMESTAMP type, so we normalize NTZ → TIMESTAMP
    here in ONE place; the session timezone is pinned UTC
    (session.py RUNTIME_CONF), making the cast an identity on the
    underlying microsecond value. Older testdata generations delivered
    ts as raw int64 nanoseconds (parquet TIMESTAMP(NANOS) via
    nanosAsLong); that branch is kept for backward compatibility.

    Note on scan parallelism: the test tables arrive as ONE parquet
    row group, so a scan is a single task (Spark cannot split below a
    row group). Operators whose map-side work dominates (shingling,
    pandas feature extraction) spread rows with an explicit HASH
    repartition on their grouping key before the heavy projection —
    a blanket round-robin repartition here measured slower (it
    local-sorts every row for retry determinism and taxes the many
    queries that are shuffle-bound anyway).
    """
    apply_runtime_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_dtype = dict(df.dtypes).get("ts")
        if ts_dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_dtype == "timestamp_ntz":
            # UTC session → NTZ and zoned TIMESTAMP share the same
            # microsecond instant; cast is identity on the value.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
