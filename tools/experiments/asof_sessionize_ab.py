"""Round-11 A/B + stage profile: ts_asof_join (4.31×) and
ts_sessionize (2.51×) — the last two >2×-vs-DuckDB sf10 families
without a pinned residual (VERDICT r10 Next #1).

Hypotheses:

asof
  A  current plan: TWO filtered scans of events (clicks + purchases)
     union'd → one hash exchange on user_id → sort → last(ignorenulls)
     running window. PLAN_AUDIT shows scans: 2 — the union reads and
     decodes events twice; at sf10 that is ~2× the I/O of the
     equivalent single-scan form.
  B  single-scan tagged select: isin('click','purchase') filter, tag
     + conditional click payload as projections — same rows, same
     window, HALF the scan.
  C  B with the judge-suggested "range-partition + sortWithinPartitions
     merge": repartitionByRange(user_id) + sortWithinPartitions
     replaces the hash exchange (RangePartitioning(user_id) satisfies
     the window's ClusteredDistribution, and the explicit sort
     satisfies its ordering). Costs an extra sampling pass for range
     bounds; measured, not assumed.

sessionize
  A  current: one scan → hash exchange on user_id → sort → lag gap
     flag + running-sum session id (two dependent Window passes over
     the same sorted run) → groupBy(user_id, session_id) agg
     (partial agg reuses the user_id clustering — 1 exchange total).
  B  window-agg fusion: session stats via min/max/count/sum windows
     over (user_id, session_id) + keep the LAST row of each session —
     trades the two hash-agg passes for one more window pass over the
     already-sorted run.
  C  A but plain double sum instead of the lsum fixed-point pair
     (is the fixed-point encode/decode visible at sf10?).

Stage floors (shared): scan-only fold, and scan+exchange+sort fold
(no window/agg), so the residual decomposes into
scan / shuffle+sort / window+agg.

Methodology: interleaved in ONE JVM, same count + bit_xor(xxhash64)
fold bench.py uses, 3 rounds, per-variant medians; variants must
fold IDENTICALLY (value identity) or the comparison is void.
DuckDB denominators re-measured best-of-2 in the SAME window.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ciws_server_spark.functions.scalar import (
    epoch_seconds,
    fixed_point,
    unscale,
)
from ciws_server_spark.operators.timeseries import (
    _SESSION_GAP_SEC,
    ts_asof_join,
    ts_sessionize,
)
from ciws_server_spark.session import get_spark
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def fold(df):
    row = df.selectExpr(
        "count(*) AS n",
        f"bit_xor(xxhash64({', '.join(df.columns)})) AS h",
    ).collect()[0]
    return row["n"], row["h"]


# ------------------------------------------------------------- asof


def _asof_single_scan(spark):
    ev = table(spark, SF_DIR, "events")
    pts = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "click", F.col("value")).alias(
            "click_value"
        ),
    )
    return pts


def _asof_window(merged):
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click = F.when(
        F.col("is_purchase") == 0, F.struct("ts", "click_value")
    )
    return (
        merged.withColumn(
            "last_click", F.last(click, ignorenulls=True).over(w)
        )
        .where(F.col("is_purchase") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("last_click.ts").alias("last_click_ts"),
            F.col("last_click.click_value").alias("last_click_value"),
        )
    )


def asof_A(spark):
    """The pre-r11 TWO-SCAN union form, reconstructed (ts_asof_join
    itself adopted the single-scan B after the first run of this
    experiment)."""
    ev = table(spark, SF_DIR, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.lit(0).alias("is_purchase"),
        F.col("value").alias("click_value"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("is_purchase"),
        F.lit(None).cast("double").alias("click_value"),
    )
    return _asof_window(clicks.unionByName(purchases))


def asof_B(spark):
    return _asof_window(_asof_single_scan(spark))


def asof_C(spark):
    pts = (
        _asof_single_scan(spark)
        .repartitionByRange(32, "user_id")
        .sortWithinPartitions("user_id", "ts", "is_purchase", "event_id")
    )
    return _asof_window(pts)


def asof_scan_floor(spark):
    return _asof_single_scan(spark)


def asof_shuffle_sort_floor(spark):
    return (
        _asof_single_scan(spark)
        .repartition(32, "user_id")
        .sortWithinPartitions("user_id", "ts", "is_purchase", "event_id")
    )


# -------------------------------------------------------- sessionize


def _sess_base(spark):
    ev = table(spark, SF_DIR, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_seconds(F.col("ts")) - epoch_seconds(F.lag("ts").over(w))
    new_session = F.when(
        gap.isNull() | (gap > _SESSION_GAP_SEC), F.lit(1)
    ).otherwise(F.lit(0))
    return ev.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )


def sess_A(spark):
    return ts_sessionize(spark, SF_DIR)


def sess_B(spark):
    sess = _sess_base(spark)
    ws = W.partitionBy("user_id", "session_id")
    wo = ws.orderBy("ts", "event_id")
    frame = ws.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    out = (
        sess.withColumn("_rn", F.row_number().over(wo))
        .withColumn("n_events", F.count(F.lit(1)).over(frame))
        .withColumn("session_start", F.min("ts").over(frame))
        .withColumn("session_end", F.max("ts").over(frame))
        .withColumn(
            "sum_value",
            F.round(
                unscale(
                    F.sum(fixed_point("value", 2)).over(frame), 2
                ),
                2,
            ),
        )
        .where(F.col("_rn") == 1)
    )
    return out.select(
        "user_id",
        "session_id",
        "n_events",
        "session_start",
        "session_end",
        "sum_value",
        F.round(
            epoch_seconds(F.col("session_end"))
            - epoch_seconds(F.col("session_start")),
            6,
        ).alias("duration_sec"),
    )


def sess_C(spark):
    sess = _sess_base(spark)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn(
            "duration_sec",
            F.round(
                epoch_seconds(F.col("session_end"))
                - epoch_seconds(F.col("session_start")),
                6,
            ),
        )
    )


def sess_D(spark):
    """lsum's long fixed-point sum, but the per-GROUP downshift is a
    plain double division instead of the decimal(38,0) chain —
    bit-identical while |sum| < 2^53 (every long in that range is an
    exact double, and one IEEE division is correctly rounded, same as
    the decimal downshift's final cast). 9.1M sessions at sf10 means
    the per-group cost IS the aggregate's tail."""
    sess = _sess_base(spark)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(
                F.sum(fixed_point("value", 2)) / F.lit(100.0), 2
            ).alias("sum_value"),
        )
        .withColumn(
            "duration_sec",
            F.round(
                epoch_seconds(F.col("session_end"))
                - epoch_seconds(F.col("session_start")),
                6,
            ),
        )
    )


def sess_scan_floor(spark):
    return table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "value"
    )


def sess_shuffle_sort_floor(spark):
    return (
        table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .repartition(32, "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
    )


def main() -> None:
    spark = get_spark("asof-sess-ab")
    spark.range(1).count()
    table(spark, SF_DIR, "events").count()  # page-cache warm, both sides

    variants = {
        "asof_A": asof_A,
        "asof_B": asof_B,
        "asof_C": asof_C,
        "asof_scan_floor": asof_scan_floor,
        "asof_shuffle_sort_floor": asof_shuffle_sort_floor,
        "sess_A": sess_A,
        "sess_B": sess_B,
        "sess_C": sess_C,
        "sess_D": sess_D,
        "sess_scan_floor": sess_scan_floor,
        "sess_shuffle_sort_floor": sess_shuffle_sort_floor,
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    folds: dict[str, tuple] = {}
    for rnd in range(ROUNDS):
        for name, fn in variants.items():
            t0 = time.time()
            got = fold(fn(spark))
            dt = time.time() - t0
            times[name].append(dt)
            prev = folds.setdefault(name, got)
            assert prev == got, f"{name} fold drifted: {prev} vs {got}"
            print(f"round {rnd} {name}: {dt:.3f}s n={got[0]}", flush=True)

    # value identity across variants of the same family (C sessionize
    # uses double sum — identity asserted separately below)
    assert folds["asof_A"] == folds["asof_B"] == folds["asof_C"]
    assert folds["sess_A"] == folds["sess_B"]
    # D must be BIT-identical to A (the adoption gate): same long
    # fixed-point sum, downshift provably identical under 2^53
    assert folds["sess_A"] == folds["sess_D"], (
        folds["sess_A"], folds["sess_D"]
    )
    print("asof identity OK; sess A==B==D OK; sess_C rows:",
          folds["sess_C"][0], "(double-sum hash may differ)")

    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    out = {"sf_dir": SF_DIR, "rounds": ROUNDS, "medians": med,
           "all": {k: [round(x, 3) for x in v] for k, v in times.items()}}
    print(json.dumps(out, indent=1))
    with open("/root/repo/tmp/ASOF_SESS_AB.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
