"""Mergeable-sketch rollups: the 100 TB approximate-aggregation layer.

At warehouse scale, "distinct users last month" cannot rescan a month
of raw events per dashboard refresh. The production pattern is a
MERGEABLE sketch rollup: each day (or ingest batch) aggregates its
events into a fixed-size sketch (Apache DataSketches HLL — Spark ships
it as ``hll_sketch_agg``/``hll_union_agg``), the daily sketches are
stored as a tiny binary-column table, and any time-span query UNIONS
the relevant day sketches — cost proportional to days, not events,
with a bounded relative error. The same shape the reference's hourly
rollup job (campus_flow_hourly) uses for exact sums, extended to the
aggregates that don't decompose exactly (distinct counts, quantiles).

These operators are deliberately NOT in the DuckDB-oracle registry:
sketch estimates are algorithm-specific (DataSketches HLL here,
different implementations elsewhere), so cross-engine value-hash
comparison is meaningless. Accuracy is asserted in
``tests/test_sketches.py`` against the EXACT aggregates, within the
published error bounds (lgK=12 → ~1.6% standard error; tests allow
3σ), and mergeability is asserted exactly: union-of-daily-sketches
must estimate the same as one sketch over the whole range.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table

#: DataSketches HLL precision: 2^12 registers ≈ 1.6% standard error,
#: 2-4 KB per sketch — the size/accuracy point most rollup tables use.
LG_K = 12


def daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (day, event_type) HLL sketch of distinct user_ids.

    This is the MATERIALIZED layer: one shuffle on (day, event_type),
    each group reduced to a ~KB binary sketch plus its point estimate.
    Row count = days × event types, independent of event volume.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .agg(
            F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("user_sketch"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "distinct_users_est",
            F.hll_sketch_estimate("user_sketch").cast("long"),
        )
    )


def union_user_sketches(
    daily: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge daily sketches up to any coarser grain (default: per
    event_type over the whole span). Scans SKETCH ROWS only — this is
    the query-time path that never touches raw events.
    """
    group_cols = group_cols if group_cols is not None else ["event_type"]
    grouped = (
        daily.groupBy(*group_cols) if group_cols else daily.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("user_sketch", F.lit(False))
        ).cast("long").alias("distinct_users_est"),
        F.sum("n_events").alias("n_events"),
    )


def save_sketch_rollup(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> None:
    """Materialize the daily sketch table (day-partitioned parquet —
    binary sketch column travels like any other column)."""
    daily_user_sketches(spark, sf_dir).write.mode("overwrite").partitionBy(
        "day"
    ).parquet(os.path.join(out_dir, "daily_user_sketches"))


def read_sketch_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "daily_user_sketches"))


def approx_value_quantiles(
    spark: SparkSession, sf_dir: str, probabilities: list[float] | None = None
) -> DataFrame:
    """Per-event-type approximate value quantiles
    (``approx_percentile`` — Greenwald-Khanna-style mergeable summary,
    single pass, bounded memory; the exact-percentile window query
    needs a full sort per group)."""
    probabilities = probabilities or [0.5, 0.9, 0.99]
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_percentile(
            "value",
            F.array(*[F.lit(p) for p in probabilities]),
            F.lit(10_000),
        ).alias("value_quantiles"),
        F.count(F.lit(1)).alias("n_events"),
    )
