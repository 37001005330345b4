"""Bit-identity pin for the q1 long-fixed-point fast path.

q1_pricing_summary runs its 8 aggregates on long fixed-point (cents /
e4 / e6) instead of DECIMAL for a measured 3.4× at sf10 (round-8
BENCH_NOTES). This test is the contract that makes that legal: the
fast form must produce the EXACT same doubles as the DECIMAL reference
form (q1_pricing_summary_decimal) — which in turn is what the DuckDB
oracle computes. Any edit to fixed_point()/unscale() or the q1 agg
tree that breaks bit-identity fails here before it fails the driver's
hash gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ciws_server_spark.functions.scalar import fixed_point, money, unscale
from ciws_server_spark.operators.tpch import (
    q1_pricing_summary,
    q1_pricing_summary_decimal,
)


def test_q1_fast_matches_decimal_reference(spark, sf_smoke):
    fast = q1_pricing_summary(spark, sf_smoke).collect()
    ref = q1_pricing_summary_decimal(spark, sf_smoke).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in ref]


def test_q1_fast_matches_decimal_reference_sf001():
    # bigger fixture (600k rows at sf0.1 would be slow for the suite;
    # sf0.01 = 60k exercises multi-partition partials + final merge)
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    if spark is None:
        from ciws_server_spark.session import get_spark

        spark = get_spark("q1-pin", master="local[4]", shuffle_partitions=4)
    fast = q1_pricing_summary(spark, "/root/testdata/sf0.01").collect()
    ref = q1_pricing_summary_decimal(spark, "/root/testdata/sf0.01").collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in ref]


def test_fixed_point_matches_money_cast(spark):
    """fixed_point == DECIMAL conversion on in-contract values,
    including negatives and exact representables."""
    # all ≤2dp — the fixed_point(.., 2) contract. (3dp values like
    # 2.675 are out-of-contract: the DECIMAL path rounds the shortest
    # string repr while FP rounds the product, and they can disagree
    # at exact .5 boundaries.)
    vals = [
        0.0, 0.01, -0.01, 1.5, -1.5, 0.07, 104999.91, -104999.91,
        50.0, 0.1, 0.08, 123.45, -123.45,
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = df.select(
        fixed_point("v", 2).alias("fp"),
        # unscaled value of the exact scale-2 DECIMAL conversion
        (F.col("v").cast("decimal(20,2)") * F.lit(100).cast("decimal(3,0)"))
        .cast("long")
        .alias("dec"),
    ).collect()
    for r in out:
        assert r.fp == r.dec, r


def test_unscale_exact_past_double_precision(spark):
    """unscale stays exact where a double division would drift: sums
    above 2^53 must produce the nearest double of the true rational."""
    big = 9007199254740993  # 2^53 + 1, not representable as double
    df = spark.createDataFrame([(big,)], ["s"])
    out = df.select(unscale(F.col("s"), 2).alias("v")).collect()[0].v
    # exact rational is 90071992547409.93; nearest double of that:
    import decimal

    expected = float(decimal.Decimal(big) / decimal.Decimal(100))
    assert out == expected


def test_window_running_revenue_fast_matches_decimal(spark):
    """Same fixed-point contract for the running-sum window (60M-row
    full-column-hash identity measured at sf10; pinned here at
    sf0.01 where every row is compared exactly)."""
    from ciws_server_spark.operators.tpch import (
        window_running_revenue,
        window_running_revenue_decimal,
    )

    sf = "/root/testdata/sf0.01"
    fast = sorted(
        tuple(r) for r in window_running_revenue(spark, sf).collect()
    )
    ref = sorted(
        tuple(r) for r in window_running_revenue_decimal(spark, sf).collect()
    )
    assert fast == ref


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q1_plan_shape_guard(spark, sf_smoke):
    """Pin q1's accepted plan shape (round-8 adjudication: the residual
    2.0-2.2× vs DuckDB at sf10 is the parquet-scan floor, BENCH_NOTES
    §6 — no further rewrites). This guard makes that durable: a future
    edit must not silently regress to the 5.79× DECIMAL path or grow an
    extra exchange.

    Expected physical shape (verified round 9):
      scan → partial/final HashAggregate on (rf, ls, partition_id)
      [long sums inside codegen] → Exchange(3 keys) → HashAggregate on
      (rf, ls) [decimal(38,0) exact sums of partials] → Exchange(2
      keys) → rangepartitioning Exchange for the final sort. Three
      exchanges total, each carrying ≤ |groups|×|partitions| rows
      until the last.
    """
    plan = _formatted_plan(spark, q1_pricing_summary(spark, sf_smoke))
    # long fast path, not DECIMAL money arithmetic in the hot loop
    assert "decimal(30,6)" not in plan, "q1 regressed to the DECIMAL path"
    assert "as bigint)" in plan, "stage-1 partials are not long sums"
    # stage-2 exact merge of partials
    assert "decimal(38,0)" in plan, "stage-2 exact DECIMAL merge missing"
    # two-stage agg: stage-1 keys include spark_partition_id (rendered
    # as _nondeterministic in the physical plan)
    assert "_nondeterministic" in plan, "partition-id stage-1 key missing"
    # exactly 3 exchanges: stage-1 hash, stage-2 hash, final sort range
    n_exchanges = plan.count(") Exchange")
    assert n_exchanges == 3, f"expected 3 exchanges, got {n_exchanges}"
    assert "rangepartitioning" in plan


def test_q1_overflow_guard_falls_back_to_decimal(spark, sf_smoke):
    """ADVICE r8: q1's long partials wrap silently if an input
    partition is far larger than the assumed parquet split. The guard
    must route to the exact DECIMAL form when
    spark.sql.files.maxPartitionBytes exceeds the safe bound — and the
    two forms stay bit-identical on in-contract data either way."""
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, str(4 << 30))  # 4 GiB > 2 GiB bound
        guarded = q1_pricing_summary(spark, sf_smoke)
        plan = _formatted_plan(spark, guarded)
        assert "decimal(30,6)" in plan, "guard did not take DECIMAL path"
        assert "_nondeterministic" not in plan
        rows_guarded = [tuple(r) for r in guarded.collect()]
    finally:
        spark.conf.set(key, old)
    fast = [tuple(r) for r in q1_pricing_summary(spark, sf_smoke).collect()]
    assert rows_guarded == fast


def test_cube_two_stage_matches_decimal_reference(spark, sf_smoke):
    """Same contract for cube_order_stats: the CUBE-over-partials
    long-cents form must emit the exact rows of the raw-cube DECIMAL
    reference (all 4 grouping sets, including the data-null merge
    behavior and the NULLS FIRST ordering)."""
    from ciws_server_spark.operators.tpch import (
        cube_order_stats,
        cube_order_stats_decimal,
    )

    fast = cube_order_stats(spark, sf_smoke).collect()
    ref = cube_order_stats_decimal(spark, sf_smoke).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in ref]


def test_cube_two_stage_matches_decimal_reference_sf001(spark):
    from ciws_server_spark.operators.tpch import (
        cube_order_stats,
        cube_order_stats_decimal,
    )

    fast = cube_order_stats(spark, "/root/testdata/sf0.01").collect()
    ref = cube_order_stats_decimal(spark, "/root/testdata/sf0.01").collect()
    assert len(fast) > 4  # all grouping sets present, not vacuous
    assert [tuple(r) for r in fast] == [tuple(r) for r in ref]


def test_rollup_two_stage_matches_decimal_reference(spark, sf_smoke):
    from ciws_server_spark.operators.tpch import (
        rollup_pricing,
        rollup_pricing_decimal,
    )

    fast = rollup_pricing(spark, sf_smoke).collect()
    ref = rollup_pricing_decimal(spark, sf_smoke).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in ref]


def test_rollup_two_stage_matches_decimal_reference_sf001(spark):
    from ciws_server_spark.operators.tpch import (
        rollup_pricing,
        rollup_pricing_decimal,
    )

    fast = rollup_pricing(spark, "/root/testdata/sf0.01").collect()
    ref = rollup_pricing_decimal(spark, "/root/testdata/sf0.01").collect()
    assert len(fast) > 4
    assert [tuple(r) for r in fast] == [tuple(r) for r in ref]

def test_grouping_sets_two_stage_matches_decimal_reference(spark):
    """grouping_sets_orders stays a spark.sql() front-door query; its
    two-stage SQL (partials in LONG cents, Expand over partials) must
    emit the exact rows of the single-stage DECIMAL SQL — both grouping
    sets, data-null merges, NULLS FIRST ordering — at two SFs."""
    from ciws_server_spark.operators.tpch import (
        grouping_sets_orders,
        grouping_sets_orders_decimal,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        fast = grouping_sets_orders(spark, sf_dir).collect()
        ref = grouping_sets_orders_decimal(spark, sf_dir).collect()
        assert len(fast) > 4
        assert [tuple(r) for r in fast] == [tuple(r) for r in ref]


def test_grouping_sets_overflow_guard_falls_back(spark, sf_smoke):
    from ciws_server_spark.operators.tpch import grouping_sets_orders

    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, str(4 << 30))
        plan = _formatted_plan(spark, grouping_sets_orders(spark, sf_smoke))
        assert "spark_partition_id" not in plan, "guard did not take DECIMAL path"
    finally:
        spark.conf.set(key, old)

def test_lsum_lavg_match_dsum_davg(spark):
    """lsum/lavg (long fixed-point) must emit bit-identical doubles to
    dsum/davg (DECIMAL) on in-contract 2-dp data, including negatives
    and sums past 2^53 cents."""
    from ciws_server_spark.functions.scalar import davg, dsum, lavg, lsum

    rows = [(i % 3, round((-1) ** i * (i * 97.13 % 491), 2)) for i in range(5000)]
    df = spark.createDataFrame(rows, "k int, value double")
    a = (
        df.groupBy("k")
        .agg(dsum("value").alias("s"), davg("value").alias("a"))
        .orderBy("k")
        .collect()
    )
    b = (
        df.groupBy("k")
        .agg(lsum("value").alias("s"), lavg("value").alias("a"))
        .orderBy("k")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_lsum53_matches_lsum_in_contract(spark):
    """lsum53 (double-division downshift) must emit bit-identical
    doubles to lsum (decimal downshift) while |sum·100| < 2^53 — the
    contract ts_sessionize relies on (gap-bounded sessions). Probe
    negatives, many groups, and a group summing near 2^31 cents."""
    from ciws_server_spark.functions.scalar import lsum, lsum53

    rows = [
        (i % 97, round((-1) ** i * (i * 31.37 % 997), 2))
        for i in range(20000)
    ]
    rows += [(997, 21474836.47)] * 100  # one group → ~2^31 cents
    df = spark.createDataFrame(rows, "k int, value double")
    a = df.groupBy("k").agg(lsum("value").alias("s")).orderBy("k").collect()
    b = (
        df.groupBy("k").agg(lsum53("value").alias("s")).orderBy("k")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_date_functions_two_stage_matches_decimal_reference(spark):
    from ciws_server_spark.operators.tpch import (
        date_functions_orders,
        date_functions_orders_decimal,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        fast = date_functions_orders(spark, sf_dir).collect()
        ref = date_functions_orders_decimal(spark, sf_dir).collect()
        assert len(fast) > 12
        assert [tuple(r) for r in fast] == [tuple(r) for r in ref]


def test_q3_fixed_point_matches_decimal_reference(spark):
    """r14: q3's revenue moved to the q1-style long fixed-point path
    (adopted from the bit-identical sf10 A/B, tmp/Q3Q5_AB_R14.json).
    The DECIMAL reference form is rebuilt inline here — identical join
    tree, _revenue() DECIMAL aggregation — and must match the shipped
    plan exactly. Unlike q1, q3 needs no partition-size guard: sums
    are per-order (a handful of rows), so partials can never approach
    2^53 at any scale factor."""
    from ciws_server_spark.operators.tpch import (
        _revenue,
        q3_shipping_priority,
    )
    from ciws_server_spark.tables import table

    sf_dir = "/root/testdata/sf0.01"

    def q3_decimal(spark, sf_dir):
        cust = table(spark, sf_dir, "customer").where(
            F.col("c_mktsegment") == "BUILDING"
        )
        orders = table(spark, sf_dir, "orders").where(
            F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
        )
        li = table(spark, sf_dir, "lineitem").where(
            F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
        )
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
            .agg(
                F.round(F.sum(_revenue()).cast("double"), 2).alias(
                    "revenue"
                )
            )
            .orderBy(F.desc("revenue"), "o_orderkey")
            .limit(10)
        )

    fast = q3_shipping_priority(spark, sf_dir).collect()
    ref = q3_decimal(spark, sf_dir).collect()
    assert fast and [tuple(r) for r in fast] == [tuple(r) for r in ref]
