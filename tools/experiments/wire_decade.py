"""Wire-plane decade ledger (r15, VERDICT r14 ask #8).

Every engine-side family has three decades of scale evidence; the
/query END-TO-END path (translate → snapshot read → serialize_frame →
row cap / chunked stream) had none beyond sf0.1. This runner builds a
measurement table at two sizes a decade apart and times, per size:

  * ``capped``    — ``SELECT *`` through the default row cap
                    (scan + composite sort + CollectLimit + serialize:
                    the hot wire path a capped client sees);
  * ``chunked``   — a CONSTANT-volume chunked drain
                    (``LIMIT _DRAIN_ROWS``, chunked=true, fully
                    iterated): serializer throughput must be flat in
                    TABLE size — growth here would mean the serializer
                    scans past the limit;
  * ``agg``       — ``count/mean GROUP BY time(1h)``: full-scan,
                    bounded output — the decade slope of the scan side
                    of the wire.

No super-linear step = capped/agg slopes ≲ decade ratio, chunked ~1×.

Usage: python tools/experiments/wire_decade.py [rows_small] [factor]
Writes tmp/WIRE_DECADE.json.
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

ROWS_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10
_DRAIN_ROWS = 200_000
T0 = dt.datetime(2024, 3, 1)


def build_table(spark, table_dir: str, n_rows: int) -> None:
    from pyspark.sql import functions as F

    from ciws_server_spark.sources import sinks

    df = (
        spark.range(0, n_rows, 1, 32)
        .select(
            (F.lit(T0).cast("timestamp")
             + F.make_interval(secs=F.col("id") * 0.001)).alias("time"),
            F.concat(F.lit("h"), (F.col("id") % 37).cast("string")).alias(
                "host"
            ),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
    )
    sinks.append_points(df, table_dir, "wire_m")


def timed_queries(api) -> dict:
    out = {}

    t0 = time.perf_counter()
    status, body = api.handle_query({"q": "SELECT * FROM wire_m"})
    assert status == 200, body
    series = body["results"][0]["series"][0]
    out["capped"] = {
        "sec": round(time.perf_counter() - t0, 3),
        "rows": len(series["values"]),
    }

    t0 = time.perf_counter()
    status, chunks = api.handle_query_chunked(
        {"q": f"SELECT * FROM wire_m LIMIT {_DRAIN_ROWS}"}
    )
    assert status == 200
    n = 0
    for ch in chunks:
        for res in ch.get("results", []):
            for s in res.get("series", []):
                n += len(s.get("values", []))
    out["chunked"] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}

    t0 = time.perf_counter()
    status, body = api.handle_query(
        {"q": "SELECT count(v), mean(v) FROM wire_m GROUP BY time(1h)"}
    )
    assert status == 200, body
    out["agg"] = {
        "sec": round(time.perf_counter() - t0, 3),
        "rows": sum(
            len(s["values"]) for s in body["results"][0]["series"]
        ),
    }
    return out


def main() -> None:
    from ciws_server_spark.session import get_spark
    from ciws_server_spark.sources.http_api import InfluxHTTPApi

    spark = get_spark("wire-decade")
    spark.sparkContext.setLogLevel("ERROR")
    result = {"rows_small": ROWS_SMALL, "factor": FACTOR, "scales": {}}
    for n_rows in (ROWS_SMALL, ROWS_SMALL * FACTOR):
        wd = tempfile.mkdtemp(prefix="wire-decade-")
        try:
            t0 = time.perf_counter()
            build_table(spark, wd, n_rows)
            build_s = time.perf_counter() - t0
            # production-shaped httpd config: max-row-limit set (the
            # engine default mirrors upstream's 0 = UNBOUNDED, under
            # which 'SELECT * FROM wire_m' at the decade size is a
            # full driver collect + pure-Python JSON build — measured
            # >15 min / >10 GB RSS at 20M rows before this run was
            # killed; that finding is the r16 wire-decade caveat, and
            # the remedy is this upstream knob, not a code change)
            api = InfluxHTTPApi(spark, wd, max_row_limit=10_000)
            cold = timed_queries(api)
            warm = timed_queries(api)
            result["scales"][str(n_rows)] = {
                "build_sec": round(build_s, 3),
                "cold": cold,
                "warm": warm,
            }
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    slopes = {}
    small, big = (
        result["scales"][str(ROWS_SMALL)],
        result["scales"][str(ROWS_SMALL * FACTOR)],
    )
    for k in ("capped", "chunked", "agg"):
        a, b = small["warm"][k]["sec"], big["warm"][k]["sec"]
        slopes[k] = round(b / a, 2) if a else None
    result["warm_decade_slope"] = slopes
    os.makedirs("tmp", exist_ok=True)
    with open("tmp/WIRE_DECADE.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["warm_decade_slope"]))
    spark.stop()


if __name__ == "__main__":
    main()
