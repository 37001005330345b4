"""Reader-during-mutation wire soak — evidence runner (r12 ask #5;
extended with CQ ticks + subscription forwarding per r13 ask #8).

Scaled-up form of tests/test_wire_reader_soak.py: concurrent /query
readers (unchunked + chunked) against a store mutated by /write
batches, InfluxQL whole-batch DELETEs, DROP/recreate of a side
measurement, retention-policy ticks, a compactor loop, a CONTINUOUS
QUERY scheduler tick (INTO-rollup executing against the mutating
store), and per-write subscription forwarding to a registered
destination. Invariants: every response is a consistent snapshot —
each batch tag counts 0 or K points; the CQ rollup never shows a
bucket with more than K points; no non-200, no raised error, ever.

Writes tmp/WIRE_READER_SOAK.json.

Usage: python tools/experiments/wire_reader_soak.py [n_batches]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

K = 25
T0 = dt.datetime(2024, 3, 1)
BASE_NS = int((T0 - dt.datetime(1970, 1, 1)).total_seconds() * 1e9)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    import tempfile

    from ciws_server_spark.session import get_spark
    from ciws_server_spark.sources import sinks
    from ciws_server_spark.sources.http_api import InfluxHTTPApi

    spark = get_spark("wire-reader-soak")
    wd = tempfile.mkdtemp(prefix="wire-reader-soak-")
    api = InfluxHTTPApi(spark, wd)

    # r13 ask #8: subscription forwarding under contention — every
    # accepted /write also lands a line-protocol copy at the
    # destination; checked at the end against the write count
    sub_dest = tempfile.mkdtemp(prefix="wire-soak-subdest-")
    status, body = api.handle_query(
        {"q": 'CREATE SUBSCRIPTION "soak_sub" ON ciws."autogen" '
              f"DESTINATIONS ALL 'file://{sub_dest}'"}
    )
    assert status == 200 and "error" not in body["results"][0], body

    # ... and a CONTINUOUS QUERY whose scheduler tick executes an
    # INTO-rollup against the mutating store (engine API for the
    # CREATE: the wire's deterministic-clock contract requires now=)
    from ciws_server_spark.plans.influxql import run_influxql

    run_influxql(
        spark, {},
        "CREATE CONTINUOUS QUERY cq_soak ON ciws BEGIN "
        "SELECT count(v) INTO soak_rollup FROM soak_m "
        "GROUP BY time(1s), batch END",
        table_dir=wd,
        now=T0,
    )

    def write_batch(b: int) -> int:
        lines = "\n".join(
            f"soak_m,batch=b{b:04d} v={b}.{j} "
            f"{BASE_NS + b * 10**9 + j * 10**6}"
            for j in range(K)
        )
        status, _ = api.handle_write({}, lines.encode())
        return status

    assert write_batch(0) == 204
    stop = threading.Event()
    errors: list = []
    counts = {
        "writes": 0, "deletes": 0, "drops": 0, "rp_ticks": 0,
        "cq_ticks": 0, "cq_windows_run": 0,
        "compact_ok": 0, "compact_abort": 0,
        "reads_plain": 0, "reads_chunked": 0, "reads_rollup": 0,
        "torn_reads": 0,
    }
    written, deleted = {0}, set()
    lock = threading.Lock()

    def guard(name, fn):
        def run():
            try:
                fn()
            except Exception as e:  # noqa: BLE001
                import traceback

                errors.append((name, repr(e), traceback.format_exc()))
                stop.set()
        return run

    def writer():
        for b in range(1, n_batches):
            if stop.is_set():
                return
            st = write_batch(b)
            assert st == 204, f"write {b} -> {st}"
            with lock:
                written.add(b)
            counts["writes"] += 1
        stop.set()

    def deleter():
        while not stop.is_set():
            with lock:
                candidates = sorted(written - deleted)
            if len(candidates) > 3:
                b = candidates[0]
                status, body = api.handle_query(
                    {"q": f"DELETE FROM soak_m WHERE batch = 'b{b:04d}'"}
                )
                assert status == 200, (status, body)
                assert "error" not in body["results"][0], body
                with lock:
                    deleted.add(b)
                counts["deletes"] += 1
            time.sleep(0.05)

    def dropper():
        # DROP/recreate an unrelated measurement: exercises the DROP
        # rename path + load_tables churn under the readers
        while not stop.is_set():
            api.handle_write(
                {}, f"side_m v=1 {BASE_NS}".encode()
            )
            status, body = api.handle_query(
                {"q": "DROP MEASUREMENT side_m"}
            )
            assert status == 200, (status, body)
            counts["drops"] += 1
            time.sleep(0.2)

    def rp_ticker():
        from ciws_server_spark.plans.retention import enforce_retention

        while not stop.is_set():
            # no default RP registered: the tick is a metadata no-op,
            # but it walks the store while everything else mutates
            enforce_retention(spark, wd, dt.datetime(2024, 6, 1))
            counts["rp_ticks"] += 1
            time.sleep(0.3)

    def compactor():
        while not stop.is_set():
            try:
                sinks.compact_table(spark, wd, "soak_m")
                counts["compact_ok"] += 1
            except (sinks.CompactorBusy, sinks.ConcurrentAppendDetected):
                counts["compact_abort"] += 1
            time.sleep(0.05)

    def cq_ticker():
        # the CQ scheduler advances a synthetic clock past the data's
        # time range, so each tick executes the INTO-rollup (append
        # mode) over freshly closed 1s buckets while writers /
        # deleters / compactors churn the source table
        from ciws_server_spark.plans.continuous import (
            run_due_continuous_queries,
        )

        now = T0
        while not stop.is_set():
            now += dt.timedelta(seconds=30)
            ran = run_due_continuous_queries(
                spark, sinks.load_tables(spark, wd), wd, now
            )
            counts["cq_ticks"] += 1
            counts["cq_windows_run"] += sum(
                r.get("buckets", 0) for r in ran.values()
            )
            time.sleep(0.4)

    def reader_rollup():
        # the CQ target is itself read under contention. Each batch's
        # K points sit inside ONE 1s bucket and land as ONE file
        # (atomic to readers), and CQ executions read a pinned
        # snapshot — so every materialized rollup window must count
        # EXACTLY K: more is a double-append, less is a torn read.
        while not stop.is_set():
            status, body = api.handle_query(
                {"q": "SELECT min(count_v), max(count_v) FROM soak_rollup"}
            )
            assert status == 200, (status, body)
            for res in body["results"]:
                if "unknown measurement" in res.get("error", ""):
                    continue  # CQ hasn't materialized its target yet
                assert "error" not in res, res
                for s in res.get("series", []):
                    for row in s["values"]:
                        vals = [v for v in row[1:] if v is not None]
                        if any(v != K for v in vals):
                            counts["torn_reads"] += 1
                            raise AssertionError(
                                f"torn CQ rollup window: {row}"
                            )
            counts["reads_rollup"] += 1
            time.sleep(0.1)

    def check(series_values):
        for row in series_values:
            if row[-1] != K:
                counts["torn_reads"] += 1
                raise AssertionError(f"torn batch read: {row}")

    def reader_plain():
        while not stop.is_set():
            status, body = api.handle_query(
                {"q": "SELECT count(v) FROM soak_m GROUP BY batch"}
            )
            assert status == 200, (status, body)
            for res in body["results"]:
                assert "error" not in res, res
                for s in res.get("series", []):
                    check(s["values"])
            counts["reads_plain"] += 1

    def reader_chunked():
        while not stop.is_set():
            status, chunks = api.handle_query_chunked(
                {"q": "SELECT count(v) FROM soak_m GROUP BY batch",
                 "chunk_size": "7"}
            )
            assert status == 200
            for env in chunks:
                for res in env["results"]:
                    assert "error" not in res, res
                    for s in res.get("series", []):
                        check(s["values"])
            counts["reads_chunked"] += 1

    t0 = time.time()
    threads = [
        threading.Thread(target=guard(n, f))
        for n, f in [
            ("writer", writer), ("deleter", deleter),
            ("dropper", dropper), ("rp_ticker", rp_ticker),
            ("compactor", compactor), ("reader_plain", reader_plain),
            ("reader_chunked", reader_chunked),
            ("cq_ticker", cq_ticker), ("reader_rollup", reader_rollup),
        ]
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=3600)
    wall = round(time.time() - t0, 1)

    # subscription invariant: every accepted soak_m/side_m write
    # forwarded one line-protocol file to the destination (forwarding
    # is synchronous on the write path; drops would mean lost fan-out)
    import glob as _glob

    sub_files = len(_glob.glob(os.path.join(sub_dest, "*.lp")))
    out = {
        "n_batches": n_batches,
        "k_points": K,
        "wall_s": wall,
        "counts": counts,
        "subscription_files": sub_files,
        "subscription_ok": sub_files >= counts["writes"],
        "errors": errors[:10],
        "ok": not errors and sub_files >= counts["writes"],
    }
    path = os.path.join("/root/repo", "tmp", "WIRE_READER_SOAK.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    if errors:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
