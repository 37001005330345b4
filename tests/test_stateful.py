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
