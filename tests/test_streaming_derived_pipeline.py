"""Full streaming §3.3 lifecycle: flow rows stream in → stateful
pulse-pair operator → derived table append, incremental across runs."""

from __future__ import annotations

import datetime as dt
import os


def _write_batch(spark, src, name, rows):
    spark.createDataFrame(rows, ["user_id", "ts"]).coalesce(1).write.parquet(
        str(src / name)
    )


def test_streaming_derived_rate_to_table(spark, tmp_path):
    from ciws_server_spark.streaming.stateful import derived_rate_stream

    base = dt.datetime(2021, 3, 1)
    src = tmp_path / "pulses"
    out = str(tmp_path / "derived")
    ckpt = str(tmp_path / "ckpt")

    def run_pass():
        stream = (
            spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            derived_rate_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # pass 1: two pulses → one pair
    _write_batch(
        spark, src, "f1",
        [(7, base), (7, base + dt.timedelta(seconds=59))],
    )
    run_pass()
    rows = spark.read.parquet(out).collect()
    assert [(r["user_id"], r["rate"]) for r in rows] == [(7, 1.0)]

    # pass 2: one more pulse → exactly one NEW pair, paired against the
    # state carried in the checkpoint (last pulse of pass 1)
    _write_batch(spark, src, "f2", [(7, base + dt.timedelta(seconds=179))])
    run_pass()
    rows = sorted(
        spark.read.parquet(out).collect(), key=lambda r: r["ts"]
    )
    assert [r["rate"] for r in rows] == [1.0, round(60.0 / 121, 6)]
    assert str(rows[1]["prev_ts"]) == "2021-03-01 00:00:59"
