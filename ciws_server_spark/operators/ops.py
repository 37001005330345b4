"""Fleet-ops operators over file listings (SURVEY.md A1-A3, P11).

The reference's ops plane works on per-host file listings:
``datalogger_health_check.py:86-94`` (latest ``multi_meter*`` file per
host, alert when >2 days old — implemented as evidently intended; the
original crashes calling ``.st_mtime`` on a string) and
``memory_manager.py:3-18`` (delete oldest files until a free-space
target, non-functional as written; SURVEY.md §7.4.2).

Inputs are DataFrames of ``(host, filename, mtime, size)`` — a tiny
control-plane dataset, but expressed as ordinary distributed queries
so a million-file fleet listing works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DEFAULT_STALE_SEC = 2 * 86400
DEFAULT_PREFIX = "multi_meter"


def latest_file_per_host(
    listing: DataFrame, prefix: str = DEFAULT_PREFIX
) -> DataFrame:
    """A1 + P11 — argmax by mtime with filename-prefix predicate."""
    return (
        listing.where(F.col("filename").startswith(prefix))
        .groupBy("host")
        .agg(
            F.max_by("filename", "mtime").alias("latest_file"),
            F.max("mtime").alias("latest_mtime"),
        )
    )


def stale_hosts(
    listing: DataFrame,
    prefix: str = DEFAULT_PREFIX,
    stale_sec: float = DEFAULT_STALE_SEC,
    now=None,
) -> DataFrame:
    """A2 — hosts whose newest matching file is older than the SLO.

    ``now`` defaults to wall clock; pass a literal for deterministic
    tests/backfills.
    """
    now = F.current_timestamp() if now is None else F.lit(now).cast("timestamp")
    latest = latest_file_per_host(listing, prefix)
    age = now.cast("double") - F.col("latest_mtime").cast("double")
    return (
        latest.withColumn("age_sec", F.round(age, 3))
        .where(F.col("age_sec") > stale_sec)
        .select("host", "latest_file", "latest_mtime", "age_sec")
    )


def retention_file_plan(listing: DataFrame, free_bytes_needed: int) -> DataFrame:
    """A3 — delete-oldest plan: files to remove until the target is
    freed, per host. Cumulative-size window in mtime order; the file
    that crosses the target is included (the reference deletes until
    free space ≥ target)."""
    w = (
        W.partitionBy("host")
        .orderBy("mtime", "filename")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    freed_before = F.sum("size").over(w) - F.col("size")
    return (
        listing.withColumn("freed_before", freed_before)
        .where(F.col("freed_before") < free_bytes_needed)
        .select("host", "filename", "mtime", "size")
    )
