"""Schema evolution under the append-only store (the InfluxDB
measurement model: fields may be added over a measurement's life).

The hazard this pins (measured before the fix): plain
``spark.read.parquet`` samples ONE footer, so after a field is added
the column is visible or invisible depending on which file gets
sampled — and a compaction rewrite through such a read silently
DROPPED the column. The schema sidecar (written under the write lock
on every append) is the single source of truth all readers and
rewriting mutators apply.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from ciws_server_spark.sources import sinks

T1 = dt.datetime(2024, 1, 1, 6)
T2 = dt.datetime(2024, 1, 2, 6)


def _evolved_table(spark, table_dir):
    v1 = spark.createDataFrame(
        [(T1, "A", 1.0)],
        "time timestamp, buildingID string, flowRate double",
    )
    sinks.append_points(v1, table_dir, "campus_flow")
    v2 = spark.createDataFrame(
        [(T2, "B", 2.0, 37.5)],
        "time timestamp, buildingID string, flowRate double, tempC double",
    )
    sinks.append_points(v2, table_dir, "campus_flow")
    return os.path.join(table_dir, "campus_flow")


def test_read_table_null_fills_pre_evolution_files(spark, tmp_path):
    table_dir = str(tmp_path)
    _evolved_table(spark, table_dir)
    df = sinks.read_table(spark, table_dir, "campus_flow")
    assert "tempC" in df.columns
    got = {r["buildingID"]: r["tempC"] for r in df.collect()}
    assert got["A"] is None and got["B"] == 37.5


def test_compact_preserves_late_added_field(spark, tmp_path):
    table_dir = str(tmp_path)
    root = _evolved_table(spark, table_dir)
    sinks.compact_table(spark, table_dir, "campus_flow")
    df = spark.read.option("mergeSchema", "true").parquet(root)
    assert "tempC" in df.columns, "compaction dropped an evolved column"
    assert df.count() == 2


def test_delete_preserves_late_added_field(spark, tmp_path):
    table_dir = str(tmp_path)
    root = _evolved_table(spark, table_dir)
    # delete touches the PRE-evolution file; its survivors must be
    # rewritten under the full schema, not the file's own
    n = sinks.delete_points(
        spark, table_dir, "campus_flow", "buildingID = 'A' AND flowRate > 5"
    )
    assert n == 0 or n == 1  # predicate may match nothing at this data
    n = sinks.delete_points(spark, table_dir, "campus_flow", "flowRate = 999")
    assert n == 0
    n = sinks.delete_points(
        spark, table_dir, "campus_flow", "buildingID = 'A'"
    )
    assert n == 1
    df = sinks.read_table(spark, table_dir, "campus_flow")
    assert "tempC" in df.columns
    assert df.count() == 1


def test_dedupe_runs_under_full_schema(spark, tmp_path):
    table_dir = str(tmp_path)
    _evolved_table(spark, table_dir)
    dup = spark.createDataFrame(
        [(T2, "B", 9.0, 40.0)],
        "time timestamp, buildingID string, flowRate double, tempC double",
    )
    sinks.append_points(dup, table_dir, "campus_flow")
    removed = sinks.dedupe_points(spark, table_dir, "campus_flow")
    assert removed == 1
    df = sinks.read_table(spark, table_dir, "campus_flow")
    assert "tempC" in df.columns and df.count() == 2


def test_type_conflict_refused_before_write(spark, tmp_path):
    table_dir = str(tmp_path)
    root = _evolved_table(spark, table_dir)
    n_before = len(
        [f for _d, _s, fs in os.walk(os.path.realpath(root)) for f in fs]
    )
    bad = spark.createDataFrame(
        [(T2, "C", "not-a-number")],
        "time timestamp, buildingID string, flowRate string",
    )
    with pytest.raises(sinks.SchemaConflict, match="flowRate"):
        sinks.append_points(bad, table_dir, "campus_flow")
    n_after = len(
        [f for _d, _s, fs in os.walk(os.path.realpath(root)) for f in fs]
    )
    assert n_after == n_before  # refused before any file landed


def test_fileless_snapshot_reads_with_schema(spark, tmp_path):
    """Delete-all leaves a snapshot with zero parquet files; the
    schema sidecar still answers reads (the schema-under-emptiness a
    transaction log provides — formerly a documented gap)."""
    table_dir = str(tmp_path)
    _evolved_table(spark, table_dir)
    assert sinks.delete_points(
        spark, table_dir, "campus_flow", "flowRate >= 0"
    ) == 2
    df = sinks.read_table(spark, table_dir, "campus_flow")
    assert df.count() == 0
    assert {"time", "buildingID", "flowRate", "tempC"} <= set(df.columns)


def test_drop_measurement_removes_sidecar(spark, tmp_path):
    from ciws_server_spark.plans.influxql import execute_drop

    table_dir = str(tmp_path)
    root = _evolved_table(spark, table_dir)
    assert os.path.exists(sinks._schema_file(root))
    assert execute_drop(spark, "DROP MEASUREMENT campus_flow", table_dir)
    assert not os.path.exists(sinks._schema_file(root))


def test_load_tables_builds_evolved_registry(spark, tmp_path):
    """One call builds the run_influxql measurement registry with
    every table under its full evolved schema, ignoring sidecars,
    version dirs, and locks."""
    table_dir = str(tmp_path)
    _evolved_table(spark, table_dir)
    other = spark.createDataFrame(
        [(T1, "S1", 3.0)],
        "time timestamp, siteID string, pulse double",
    )
    sinks.append_points(other, table_dir, "raw_data")
    sinks.compact_table(spark, table_dir, "campus_flow")  # → symlink+vdir
    tables = sinks.load_tables(spark, table_dir)
    assert set(tables) == {"campus_flow", "raw_data"}
    assert "tempC" in tables["campus_flow"].columns
    from ciws_server_spark.plans.influxql import run_influxql

    keys = run_influxql(
        spark, tables, "SHOW FIELD KEYS FROM campus_flow"
    ).collect()
    assert "tempC" in {r["fieldKey"] for r in keys}


def test_streaming_batch_appends_register_schema(spark, tmp_path):
    table_dir = str(tmp_path)
    v1 = spark.createDataFrame(
        [(T1, "A", 1.0)],
        "time timestamp, buildingID string, flowRate double",
    )
    sinks.append_points(v1, table_dir, "campus_flow", batch_id=1)
    v2 = spark.createDataFrame(
        [(T2, "B", 2.0, 1)],
        "time timestamp, buildingID string, flowRate double, qc int",
    )
    sinks.append_points(v2, table_dir, "campus_flow", batch_id=2)
    df = sinks.read_table(spark, table_dir, "campus_flow")
    assert {"qc", "batch_id"} <= set(df.columns)
    assert df.count() == 2


def test_concurrent_field_merges_lose_nothing(spark, tmp_path):
    """Two writers each introducing a DIFFERENT new field must both
    land in the sidecar. The race: both read the same registry under
    the SHARED table write lock, each stores its own merged version,
    os.replace last-wins and one field vanishes — permanently hiding
    that column from every reader. _merge_registered_schema therefore
    serializes load-merge-store under its own exclusive .schema.lock;
    this hammers the merge from two threads and asserts the union."""
    import threading

    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
        TimestampType,
    )

    table_dir = str(tmp_path)
    v1 = spark.createDataFrame(
        [(T1, "A", 1.0)],
        "time timestamp, buildingID string, flowRate double",
    )
    sinks.append_points(v1, table_dir, "campus_flow")
    root = os.path.join(table_dir, "campus_flow")

    base = sinks._registered_schema(root)
    n_each = 12
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def merge_fields(prefix: str):
        try:
            barrier.wait()
            for i in range(n_each):
                extra = StructType(
                    base.fields
                    + [StructField(f"{prefix}_{i}", DoubleType(), True)]
                )
                sinks._merge_registered_schema(root, extra)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [
        threading.Thread(target=merge_fields, args=(p,))
        for p in ("left", "right")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    final = {f.name for f in sinks._registered_schema(root).fields}
    want = {f"left_{i}" for i in range(n_each)} | {
        f"right_{i}" for i in range(n_each)
    }
    assert want <= final, sorted(want - final)
