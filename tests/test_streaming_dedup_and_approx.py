"""Streaming exact dedup (watermarked dropDuplicates) and approximate
aggregates — the remaining §2.4/§2.9 free-win surface, exercised."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_streaming_drop_duplicates_across_batches(spark, tmp_path):
    """An event re-delivered in a later micro-batch (at-least-once
    upstream) is emitted exactly once downstream."""
    base = dt.datetime(2021, 3, 1)
    src = tmp_path / "src"
    out = str(tmp_path / "out")

    def run_pass():
        stream = (
            spark.readStream.schema("event_id BIGINT, ts TIMESTAMP")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(
            ["event_id"]
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    rows1 = [(1, base), (2, base + dt.timedelta(minutes=1))]
    spark.createDataFrame(rows1, ["event_id", "ts"]).coalesce(1).write.parquet(
        str(src / "f1")
    )
    run_pass()
    # f2 re-delivers event 2 and adds event 3
    rows2 = [(2, base + dt.timedelta(minutes=1)), (3, base + dt.timedelta(minutes=2))]
    spark.createDataFrame(rows2, ["event_id", "ts"]).coalesce(1).write.parquet(
        str(src / "f2")
    )
    run_pass()
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]  # the duplicate was dropped across batches


def test_approx_count_distinct_within_tolerance(spark, sf_smoke):
    """approx_count_distinct (HLL++) lands within its configured rsd
    of the exact distinct count — the sketch path for 100 TB where an
    exact COUNT(DISTINCT) shuffle is not affordable."""
    from ciws_server_spark.tables import table

    ev = table(spark, sf_smoke, "events")
    exact, approx = ev.agg(
        F.countDistinct("user_id").alias("e"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
    ).collect()[0]
    assert abs(approx - exact) <= max(3, 0.06 * exact)

    exact_p, approx_p = (
        ev.agg(
            F.expr("percentile(value, 0.5)").alias("e"),
            F.expr("approx_percentile(value, 0.5, 1000)").alias("a"),
        ).collect()[0]
    )
    assert abs(approx_p - exact_p) <= 0.05 * max(abs(exact_p), 1.0)
