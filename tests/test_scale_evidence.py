"""Scale-design evidence tests: bucketed co-located joins and
watermarked late-data handling — the 100 TB mechanisms, demonstrated.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path):
    """Bucketing lineitem/orders by orderkey co-locates the fact-fact
    join: the sort-merge join runs with NO Exchange on either side —
    exactly the layout the tpch docstrings prescribe for 100 TB."""
    from ciws_server_spark.tables import table

    spark.sql("CREATE DATABASE IF NOT EXISTS buckets_test")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        table(spark, sf_smoke, "orders").write.bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").mode("overwrite").saveAsTable(
            "buckets_test.orders_b"
        )
        table(spark, sf_smoke, "lineitem").write.bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable(
            "buckets_test.lineitem_b"
        )
        joined = spark.table("buckets_test.lineitem_b").join(
            spark.table("buckets_test.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql("DROP DATABASE IF EXISTS buckets_test CASCADE")


def test_watermark_drops_late_rows(spark, tmp_path):
    """Watermarked tumbling-window aggregation drops rows later than
    the watermark (the reference's in-flight/late-file guard, §2.9):
    batch 1 advances the watermark to 09:00; batch 2's 00:30 row is
    late and must NOT appear in the finalized 00:00 window."""
    base = dt.datetime(2021, 3, 1)
    src = tmp_path / "stream"

    early = [(1, base + dt.timedelta(minutes=m)) for m in (5, 10, 30)] + [
        (1, base + dt.timedelta(hours=10))
    ]
    late = [(1, base + dt.timedelta(minutes=30)), (1, base + dt.timedelta(hours=12))]

    out = str(tmp_path / "out")

    def run_pass() -> dict:
        stream = (
            spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {str(r["ws"]): r["n"] for r in spark.read.parquet(out).collect()}

    # pass 1: on-time data only → watermark advances to 09:00 and the
    # 00:00 window finalizes with 3 rows (checkpointed across restarts)
    spark.createDataFrame(early, ["user_id", "ts"]).coalesce(1).write.parquet(
        str(src / "f1")
    )
    rows1 = run_pass()
    assert rows1.get("2021-03-01 00:00:00") == 3

    # pass 2: a late 00:30 row (behind the persisted watermark) and a
    # fresh 12:00 row arrive; the late row must be DROPPED — the 00:00
    # window's emitted count is unchanged
    spark.createDataFrame(late, ["user_id", "ts"]).coalesce(1).write.parquet(
        str(src / "f2")
    )
    rows2 = run_pass()
    assert rows2.get("2021-03-01 00:00:00") == 3  # late row dropped
    # 10:00 window finalizes now (watermark moved to 11:00)
    assert rows2.get("2021-03-01 10:00:00") == 1
    # 12:00 still open (watermark 11:00) → not emitted in append mode
    assert "2021-03-01 12:00:00" not in rows2


def test_date_partition_pruning(spark, tmp_path):
    """Date-partitioned writes (sinks.PARTITIONING) let a time-range
    query prune partitions BEFORE any I/O: a 3-day predicate over a
    10-day table must touch only the 3 matching date directories.
    Evidence is execution-level (input_file_name of rows actually
    read), not just the plan string."""
    import datetime as dt

    from ciws_server_spark.sources.sinks import append_points

    base = dt.datetime(2021, 3, 1)
    rows = [
        ("B1", base + dt.timedelta(days=d, hours=h), float(d * 24 + h))
        for d in range(10)
        for h in (0, 12)
    ]
    df = spark.createDataFrame(rows, ["buildingID", "time", "flow"])
    append_points(df, str(tmp_path), "campus_flow")
    root = str(tmp_path / "campus_flow")

    full = spark.read.parquet(root)
    pruned = full.where(
        (F.col("date") >= "2021-03-02") & (F.col("date") <= "2021-03-04")
    )

    # plan-level: the date conjuncts land in PartitionFilters
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "date" in plan

    n_total = full.select(F.input_file_name()).distinct().count()
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    days_read = {
        str(r["date"]) for r in pruned.select("date").distinct().collect()
    }
    assert days_read == {"2021-03-02", "2021-03-03", "2021-03-04"}
    assert n_pruned < n_total  # strictly fewer files touched
    # exactly the files living under the 3 matching date directories
    import glob

    in_range = [
        f
        for d in ("2021-03-02", "2021-03-03", "2021-03-04")
        for f in glob.glob(f"{root}/*/date={d}/*.parquet")
    ]
    assert n_pruned == len(in_range)


def test_salted_join_matches_plain_join(spark, sf_smoke):
    """Join-side salting: row-identical to the plain join, fact rows
    of one key spread across n_salts partitions, dim replicated ×n."""
    from ciws_server_spark.operators.tpch import salted_join
    from ciws_server_spark.tables import table

    # simulate skew: every lineitem keyed to ONE hot supplier
    fact = (
        table(spark, sf_smoke, "lineitem")
        .select(F.lit(1).alias("skey"), "l_orderkey", "l_quantity")
    )
    dim = table(spark, sf_smoke, "supplier").select(
        F.col("s_suppkey").alias("skey"), "s_name"
    )
    plain = fact.join(dim, "skey").groupBy("skey").count().collect()
    salted = salted_join(fact, dim, "skey", n_salts=8)
    got = salted.groupBy("skey").count().collect()
    assert got == plain  # row-identical result

    # salting targets the SHUFFLE-join regime (dim too big to
    # broadcast): force it and check the hot key's rows really land
    # in >1 task partition (keyed on (skey, salt), not just skey)
    old_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_c = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # AQE would re-coalesce these KB-sized test partitions; at
        # real skew sizes they stay separate — disable for the probe
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
        n_parts = (
            salted_join(fact, dim, "skey", n_salts=8)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_b)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", old_c
        )
    assert n_parts > 1


def test_salted_join_spreads_identical_hot_rows_and_validates_how(spark):
    """Content-duplicate skew: a hot key of BYTE-IDENTICAL fact rows
    (the common real-world case — null keys, default values) must
    still spread across >1 salt; a content-only hash would send every
    duplicate to one salt. Unsupported join types raise."""
    import pytest

    from ciws_server_spark.operators.tpch import salted_join

    fact = spark.createDataFrame(
        [(1, "same")] * 400, "skey BIGINT, payload STRING"
    ).repartition(4)
    dim = spark.createDataFrame([(1, "hot")], "skey BIGINT, name STRING")

    salted = fact.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.col("skey"), F.monotonically_increasing_id()),
            F.lit(8),
        ).cast("int"),
    )
    n_distinct_salts = salted.select("_salt").distinct().count()
    assert n_distinct_salts > 1

    out = salted_join(fact, dim, "skey", n_salts=8)
    assert out.count() == 400  # row-identical to the plain join

    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(fact, dim, "skey", how="full")
