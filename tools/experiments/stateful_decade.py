"""GroupState state-store growth evidence (VERDICT r9 Next #5).

The streaming near-dup operator has an index-growth A/B (BENCH_NOTES
§14); the applyInPandasWithState operators (derived-rate, staleness)
had none. Protocol here:

* ``derived_rate_stream`` driven through a REAL checkpointed stream
  (file source, maxFilesPerTrigger=1) for 6 micro-batches;
* per-batch wall from the engine's own query progress
  (triggerExecution ms — not wall-clock around awaitTermination);
* 1× vs 10× KEY CARDINALITY at constant per-batch row volume
  (2k keys × 20 pulses vs 20k keys × 2 pulses, 40k rows/batch both
  sides), so the only variable is the number of GroupState entries
  carried batch-to-batch;
* within each side, early-batch vs late-batch latency shows whether
  the store degrades as state accumulates across checkpointed
  batches.

Flat-or-explained is the bar: per-key state is one 8-byte timestamp,
so a 10× key count may cost more per batch (10× state rows
load/store) but must not super-scale, and batch 6 must not be slower
than batch 2 at fixed cardinality.

Writes tmp/STATEFUL_DECADE.json.
Usage: python tools/experiments/stateful_decade.py
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_BATCHES = 6
ROWS_PER_BATCH = 40_000


def run_side(spark, n_keys: int, label: str) -> dict:
    from ciws_server_spark.streaming.stateful import derived_rate_stream

    pulses_per_key = ROWS_PER_BATCH // n_keys
    assert pulses_per_key >= 2, "need ≥2 pulses per key per batch"
    work = tempfile.mkdtemp(prefix=f"stateful-decade-{label}-")
    src = os.path.join(work, "pulses")
    base = dt.datetime(2021, 3, 1)
    try:
        for b in range(N_BATCHES):
            rows = [
                (
                    k,
                    base
                    + dt.timedelta(
                        seconds=b * pulses_per_key * 60 + p * 60 + (k % 7)
                    ),
                )
                for k in range(n_keys)
                for p in range(pulses_per_key)
            ]
            spark.createDataFrame(rows, ["user_id", "ts"]).coalesce(
                1
            ).write.parquet(os.path.join(src, f"b{b:02d}"))

        stream = (
            spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        sink_name = f"stateful_decade_{label}"
        t0 = time.perf_counter()
        q = (
            derived_rate_stream(stream)
            .writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        progress = [
            {
                "batch": p["batchId"],
                "rows": p["numInputRows"],
                "trigger_ms": p["durationMs"].get("triggerExecution"),
                "state_rows": (
                    p["stateOperators"][0]["numRowsTotal"]
                    if p.get("stateOperators")
                    else None
                ),
            }
            for p in (json.loads(x.json) for x in q.recentProgress)
            if p["numInputRows"]
        ]
        n_out = spark.table(sink_name).count()
        # correctness anchor: every key pairs all its pulses across
        # all batches → (N_BATCHES * pulses_per_key - 1) pairs per key
        expect = n_keys * (N_BATCHES * pulses_per_key - 1)
        assert n_out == expect, (n_out, expect)
        return {
            "keys": n_keys,
            "pulses_per_key_batch": pulses_per_key,
            "batches": progress,
            "wall_s": round(wall, 2),
            "out_rows": n_out,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    from ciws_server_spark.session import get_spark

    spark = get_spark("stateful-decade")
    spark.range(1).count()
    out = {
        "protocol": (
            f"{N_BATCHES} checkpointed micro-batches "
            f"(maxFilesPerTrigger=1), {ROWS_PER_BATCH} rows/batch both "
            "sides; per-batch trigger ms from query progress; state "
            "rows from the state operator's numRowsTotal"
        ),
        "x1": run_side(spark, 2_000, "x1"),
        "x10": run_side(spark, 20_000, "x10"),
    }

    def med(side):
        ts = sorted(
            b["trigger_ms"] for b in side["batches"][1:]
        )  # drop batch 0 (plan+state-store init)
        return ts[len(ts) // 2]

    out["per_batch_trigger_ms_median_x1"] = med(out["x1"])
    out["per_batch_trigger_ms_median_x10"] = med(out["x10"])
    out["x10_over_x1"] = round(
        out["per_batch_trigger_ms_median_x10"]
        / out["per_batch_trigger_ms_median_x1"],
        2,
    )
    os.makedirs("/root/repo/tmp", exist_ok=True)
    with open("/root/repo/tmp/STATEFUL_DECADE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
