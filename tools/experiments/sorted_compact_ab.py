"""A/B: does time-clustered compaction actually prune time-range scans?

Builds two copies of the same table from sf1 events (scrambled insert
order, as real ingest interleaves), compacts one plain and one with
sort_by=["time"], then times a narrow time-range aggregate on each,
interleaved in one JVM (tools/experiments/README.md methodology).

The mechanism under test: with TIMESTAMP_MICROS output (session.py)
every row group carries time min/max; sorting within files makes the
spans disjoint, so the scan skips row groups whose span misses the
predicate. Unsorted files have every-row-group-overlaps-everything
spans and must decode all of them.

Usage: python tools/experiments/sorted_compact_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F

from ciws_server_spark.session import get_spark
from ciws_server_spark.sources import sinks
from ciws_server_spark.tables import table


def build(spark, sf_dir: str, td: str, sort_by):
    shutil.rmtree(td, ignore_errors=True)
    os.makedirs(td)
    ev = (
        table(spark, sf_dir, "events")
        .select(
            F.col("ts").alias("time"),
            F.col("event_type").alias("buildingID"),
            F.col("value").cast("double").alias("flowRate"),
        )
        # scramble: hash order ≈ arrival order of interleaved feeds
        .repartition(8, F.xxhash64("time"))
    )
    sinks.append_points(ev, td, "campus_flow")
    sinks.compact_table(spark, td, "campus_flow", sort_by=sort_by)
    return os.path.join(td, "campus_flow")


def probe(spark, root, lo, hi) -> float:
    t0 = time.time()
    (
        spark.read.parquet(root)
        .where((F.col("time") >= lo) & (F.col("time") < hi))
        .agg(F.sum("flowRate"), F.count("*"))
        .collect()
    )
    return time.time() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="sorted-compact-ab")
    base = "/tmp/sorted_compact_ab"
    plain = build(spark, sf_dir, base + "/plain", None)
    sorted_ = build(spark, sf_dir, base + "/sorted", ["time"])
    bounds = (
        spark.read.parquet(plain)
        .agg(F.min("time"), F.max("time"))
        .collect()[0]
    )
    lo = bounds[0]
    import datetime as dt

    hi = lo + dt.timedelta(hours=1)
    print(f"# predicate: [{lo}, {hi}) of [{bounds[0]}, {bounds[1]}]")
    for r in range(rounds):
        order = [("sorted", sorted_), ("plain", plain)]
        if r % 2:
            order = order[::-1]
        line = f"round {r}:"
        for name, root in order:
            line += f" {name}={probe(spark, root, lo, hi):.3f}s"
        print(line)


if __name__ == "__main__":
    main()
