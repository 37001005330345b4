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
    """Scan one synthetic table. UTC + AQE are pinned on first touch."""
    apply_runtime_conf(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
