"""Reader-during-mutation wire soak — evidence runner (r12 ask #5).

Scaled-up form of tests/test_wire_reader_soak.py: concurrent /query
readers (unchunked + chunked) against a store mutated by /write
batches, InfluxQL whole-batch DELETEs, DROP/recreate of a side
measurement, retention-policy ticks, and a compactor loop. Invariant:
every response is a consistent snapshot — each batch tag counts 0 or
K points, no non-200, no raised error, ever.

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
        "compact_ok": 0, "compact_abort": 0,
        "reads_plain": 0, "reads_chunked": 0, "torn_reads": 0,
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
        ]
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=3600)
    wall = round(time.time() - t0, 1)

    out = {
        "n_batches": n_batches,
        "k_points": K,
        "wall_s": wall,
        "counts": counts,
        "errors": errors[:10],
        "ok": not errors,
    }
    path = os.path.join("/root/repo", "tmp", "WIRE_READER_SOAK.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    if errors:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
