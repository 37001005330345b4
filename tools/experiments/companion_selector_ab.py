"""r11: pin the influxql_companion_selector sf10 residual (3.11× vs
DuckDB at 0.94s absolute — RATIO_SF10 r11_selector_families).

Hypotheses:
  A  current: two-stage partial/final max_by(payload_struct,
     (value, -epoch) struct) — Spark compiles struct-ordered max_by
     to SortAggregate (per-partition sort before the partial agg).
  B  two plain HASH aggs + join-back: (1) hash agg max(packed) per
     group where packed = order-preserving BIGINT encoding of
     (value, -epoch) — IEEE-754 bit trick for the double, epoch
     bucketed out — won't fit both exactly, so instead:
     max(struct(value, neg_epoch)) ... still struct. Use the honest
     variant: hash agg max(value) per group, join back rows with
     value == max, then min(epoch) tiebreak hash agg + final join.
     3 aggs + 2 joins, every one hash-able.
  C  floor: the same scan + a plain per-group hash count (what a
     selector would cost if aggregation were free of the sort).

Interleaved same-JVM, identical fold consumption; variants must agree
on values (A vs B fold identity asserted).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ciws_server_spark.session import get_spark
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
START, END = "2024-01-10 00:00:00", "2024-01-20 00:00:00"


def fold(df):
    row = df.selectExpr(
        "count(*) AS n",
        f"bit_xor(xxhash64({', '.join(df.columns)})) AS h",
    ).collect()[0]
    return row["n"], row["h"]


def _pts(spark):
    ev = table(spark, SF_DIR, "events")
    return ev.where(
        (F.col("ts") >= START) & (F.col("ts") <= END)
        & F.col("value").isNotNull()
    ).select(
        F.window("ts", "6 hours").start.alias("time_bucket"),
        "event_type", "ts", "value", "user_id",
    )


def variant_A(spark):
    pts = _pts(spark)
    epoch = F.unix_micros(F.col("ts"))
    payload = F.struct(
        F.col("ts").alias("_t"), F.col("value").alias("_v"),
        F.col("user_id").alias("_c0"),
    )
    agg = F.max_by(
        payload, F.struct(F.col("value"), (-epoch).alias("_k"))
    )
    res = (
        pts.groupBy("time_bucket", "event_type")
        .agg(agg.alias("_sel"))
        .where(F.col("_sel").isNotNull())
        .select(
            "time_bucket", "event_type",
            F.col("_sel._v").alias("max"),
            F.col("_sel._c0").alias("user_id"),
        )
    )
    return res.orderBy("time_bucket", "event_type")


def variant_B(spark):
    pts = _pts(spark)
    mx = pts.groupBy("time_bucket", "event_type").agg(
        F.max("value").alias("_mx")
    )
    hit = pts.join(mx, ["time_bucket", "event_type"]).where(
        F.col("value") == F.col("_mx")
    )
    first_ts = hit.groupBy("time_bucket", "event_type").agg(
        F.min("ts").alias("_t0"), F.max("value").alias("max")
    )
    res = (
        hit.join(first_ts, ["time_bucket", "event_type"])
        .where(F.col("ts") == F.col("_t0"))
        # duplicate (value, ts) rows: keep one deterministically
        .groupBy("time_bucket", "event_type", "max")
        .agg(F.min("user_id").alias("user_id"))
        .select("time_bucket", "event_type", "max", "user_id")
    )
    return res.orderBy("time_bucket", "event_type")


def variant_C(spark):
    pts = _pts(spark)
    return (
        pts.groupBy("time_bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("max"))
        .orderBy("time_bucket", "event_type")
    )


def main() -> None:
    spark = get_spark("companion-ab")
    spark.range(1).count()
    table(spark, SF_DIR, "events").count()
    variants = {"A": variant_A, "B": variant_B, "C_floor": variant_C}
    times = {k: [] for k in variants}
    folds = {}
    for rnd in range(ROUNDS):
        for name, fn in variants.items():
            t0 = time.time()
            got = fold(fn(spark))
            times[name].append(time.time() - t0)
            prev = folds.setdefault(name, got)
            assert prev == got, (name, prev, got)
            print(f"round {rnd} {name}: {times[name][-1]:.3f}s n={got[0]}",
                  flush=True)
    # A and B pick the same point unless a (bucket, series) holds two
    # rows with identical (value, ts) but different user_id — B's
    # min(user_id) may then differ from A's struct order; count match
    # is asserted, value identity reported
    print("A==B fold:", folds["A"] == folds["B"],
          "rows:", folds["A"][0], folds["B"][0])
    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    out = {"sf_dir": SF_DIR, "rounds": ROUNDS, "medians": med,
           "all": {k: [round(x, 3) for x in v] for k, v in times.items()}}
    print(json.dumps(out, indent=1))
    with open("/root/repo/tmp/COMPANION_AB.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
