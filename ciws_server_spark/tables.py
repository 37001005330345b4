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


def conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark size conf ('134217728', '128m', '1g') to bytes."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:
        return default
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if raw.endswith(suffix):
            raw = raw[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


def input_bytes(df: DataFrame) -> int:
    """Total on-disk bytes behind a file-backed frame (0 if unknown —
    e.g. a streaming micro-batch, which is small by construction)."""
    import re

    try:
        total = 0
        for uri in df.inputFiles():
            path = re.sub(r"^file:(//)?", "", uri)
            total += os.path.getsize(path)
        return total
    except Exception:  # noqa: BLE001 — non-file frames
        return 0


def spread_if_few_splits(
    spark: SparkSession, df: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """Hash-repartition by ``key`` ONLY when the scan yields fewer
    splits than cores — a fixture-scale corpus is a handful of 128 MB
    parquet splits, and without the spread heavy per-row projection
    work (regex/tokenization, pandas feature extraction, vector math)
    is parallelism-starved (r14 minhash sf100 stage profile: 69s of a
    178s query on ~6 of 32 cores). The condition is scale-neutral by
    construction: at the 100 TB design point splits ≫ cores, so the
    full-payload shuffle this repartition would cost never happens on
    a real cluster — it only fires when the corpus is small enough
    that shuffling it is cheap. (r15 made the dedup call sites
    conditional; r16 hoists the helper here and applies it to the
    remaining unconditional sites in text_analysis / multimodal /
    similarity — same guide §2.4 rationale, local plans unchanged at
    every fixture scale because the condition still fires there.)"""
    import math

    cores = spark.sparkContext.defaultParallelism
    mpb = conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    splits = math.ceil(max(input_bytes(df), 1) / max(mpb, 1))
    return df.repartition(key) if splits < cores else df
