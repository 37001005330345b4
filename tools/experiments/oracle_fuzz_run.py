"""Differential-oracle-fuzz evidence run (round 10).

Loops N seeded cases through tests/test_influxql_oracle_fuzz's
generator+comparator — every case executes on BOTH engines and the
values must match. Writes tmp/ORACLE_FUZZ.json.

Usage: python tools/experiments/oracle_fuzz_run.py [n_cases]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def main() -> None:
    import duckdb
    import pandas as pd

    from ciws_server_spark.session import get_spark
    import test_influxql_oracle_fuzz as m

    spark = get_spark("oracle-fuzz")
    rows = m._rows()
    pdf = pd.DataFrame(
        rows, columns=["time", "buildingID", "flowRate", "tempC"]
    )
    df = spark.createDataFrame(
        rows,
        "time timestamp, buildingID string, flowRate double, tempC double",
    )
    drows = m._rows_daily()
    dpdf = pd.DataFrame(drows, columns=["time", "buildingID", "flowRate"])
    ddf = spark.createDataFrame(
        drows, "time timestamp, buildingID string, flowRate double"
    )
    con = duckdb.connect()
    con.register("campus_flow", pdf)
    con.register("campus_daily", dpdf)
    fixture = {
        "tables": {"campus_flow": df, "campus_daily": ddf},
        "con": con,
    }

    t0 = time.time()
    kinds: Counter = Counter()
    for seed in range(N):
        r = random.Random(seed)
        iql, sql, kind = m.gen_case(r)
        m.run_case(fixture, iql, sql, kind)  # raises on any mismatch
        kinds[kind] += 1
        if (seed + 1) % 100 == 0:
            print(
                f"# {seed + 1}/{N} ({time.time() - t0:.0f}s) "
                f"{dict(kinds)}",
                flush=True,
            )
    out = {
        "cases": N,
        "kinds": dict(kinds),
        "mismatches": 0,  # run_case raises before this line otherwise
        "wall_s": round(time.time() - t0, 1),
        "seeds": f"0..{N - 1}",
    }
    os.makedirs("/root/repo/tmp", exist_ok=True)
    with open("/root/repo/tmp/ORACLE_FUZZ.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
