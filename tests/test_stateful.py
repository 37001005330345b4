"""A5 derived rate: hand-computed F4 pulse fixture + streaming/batch
equivalence for the stateful operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _pulse_df(spark):
    # F4 pattern: pulses at t=0, 59, 179 seconds (per key); expected
    # reference-compatible rate between pulses = 60/(elapsed+1).
    base = dt.datetime(2021, 3, 1)
    rows = []
    for uid in (1, 2):
        for sec in (0, 59, 179):
            rows.append((uid, base + dt.timedelta(seconds=sec)))
    return spark.createDataFrame(rows, ["user_id", "ts"])


def test_stateful_rate_matches_hand_computed(spark):
    from ciws_server_spark.streaming.stateful import derived_rate_stream

    out = derived_rate_stream(_pulse_df(spark)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["user_id"], []).append(r)
    assert set(by_key) == {1, 2}
    for uid, rows in by_key.items():
        rows.sort(key=lambda r: r["ts"])
        assert [r["elapsed_sec"] for r in rows] == [60.0, 121.0]
        assert [r["rate"] for r in rows] == [1.0, round(60.0 / 121.0, 6)]


def test_stateful_matches_batch_window_form(spark, sf_smoke):
    """Streaming-state operator ≡ batch lag-window operator (A5)."""
    from ciws_server_spark.operators.timeseries import ts_derived_rate
    from ciws_server_spark.streaming.stateful import derived_rate_stream
    from ciws_server_spark.tables import table

    batch = {
        (r["user_id"], r["ts"], r["prev_ts"]): (r["elapsed_sec"], r["rate"])
        for r in ts_derived_rate(spark, sf_smoke).collect()
    }
    pulses = (
        table(spark, sf_smoke, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "ts")
    )
    stateful = {
        (r["user_id"], r["ts"], r["prev_ts"]): (r["elapsed_sec"], r["rate"])
        for r in derived_rate_stream(pulses).collect()
    }
    assert batch == stateful


def test_stateful_streaming_state_carries_across_batches(spark, tmp_path):
    """True streaming path: 2 micro-batches (maxFilesPerTrigger=1);
    the pulse pair spanning the batch boundary must still be emitted —
    proof the GroupState carries the last pulse across batches."""
    import datetime as dt

    from ciws_server_spark.streaming.stateful import derived_rate_stream

    base = dt.datetime(2021, 3, 1)
    src = tmp_path / "pulses"
    batch1 = [(1, base), (1, base + dt.timedelta(seconds=59))]
    batch2 = [(1, base + dt.timedelta(seconds=179))]
    spark.createDataFrame(batch1, ["user_id", "ts"]).coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(batch2, ["user_id", "ts"]).coalesce(1).write.parquet(
        str(src / "f2")
    )

    stream = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        derived_rate_stream(stream)
        .writeStream.format("memory")
        .queryName("rates_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        spark.table("rates_out").collect(), key=lambda r: r["ts"]
    )
    # 3 pulses → 2 pairs, one of which crosses the micro-batch boundary
    assert [r["elapsed_sec"] for r in rows] == [60.0, 121.0]
    assert [r["rate"] for r in rows] == [1.0, round(60.0 / 121.0, 6)]


def test_session_window_stream_batch_equivalence(spark, sf_smoke):
    """session_window gap sessions agree with the lag-flag batch form
    on session count per user (same 1h gap)."""
    from ciws_server_spark.operators.timeseries import ts_sessionize
    from ciws_server_spark.streaming.stateful import session_window_stream
    from ciws_server_spark.tables import table

    ev = table(spark, sf_smoke, "events").select("user_id", "ts")
    sw = session_window_stream(ev, gap="1 hour")
    got = {
        r["user_id"]: r["n"]
        for r in sw.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    exp = {
        r["user_id"]: r["n"]
        for r in ts_sessionize(spark, sf_smoke)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp


def test_staleness_monitor_timer_fires_on_silent_key(spark, tmp_path):
    """A2 as a true stream (transformWithStateInPandas event-time
    timers): user 1 goes silent, user 2 keeps reporting. When the
    watermark passes user 1's last_ts + stale window, exactly one
    alert is emitted; user 2's timer keeps re-arming. State and
    timers live in the checkpoint, spanning availableNow runs."""
    import datetime as dt

    from ciws_server_spark.streaming.stateful import staleness_monitor_stream

    base = dt.datetime(2021, 3, 1)
    src = tmp_path / "events"
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        spark.createDataFrame(rows, ["user_id", "ts"]).coalesce(1).write.parquet(
            str(src / name)
        )

    def run_pass():
        stream = (
            spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            staleness_monitor_stream(stream, stale_sec=7200)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: both users alive at t0; batch 2: only user 2 at t0+3h.
    # Watermark reaches t0+3h-1s > user1's timer (t0+2h) → fires.
    land("f1", [(1, base), (2, base)])
    land("f2", [(2, base + dt.timedelta(hours=3))])
    run_pass()
    import os

    rows = spark.read.parquet(out).collect() if os.path.isdir(out) else []
    assert [(r["user_id"], str(r["last_ts"])) for r in rows] == [
        (1, "2021-03-01 00:00:00")
    ]

    # second RUN: user 2 stays silent past its re-armed timer
    # (t0+3h+2h); a new point at t0+6h advances the watermark → the
    # timer registered in the PREVIOUS run fires (checkpointed state)
    land("f3", [(3, base + dt.timedelta(hours=6))])
    run_pass()
    rows = sorted(spark.read.parquet(out).collect(), key=lambda r: r["user_id"])
    assert [(r["user_id"], str(r["last_ts"])) for r in rows] == [
        (1, "2021-03-01 00:00:00"),
        (2, "2021-03-01 03:00:00"),
    ]
