"""Round-10 evidence artifact: ≥10k generated InfluxQL statements
through the dispatcher (VERDICT r9 Next #7 'Done' criterion).

Reuses the exact generators from tests/test_influxql_statement_fuzz.py
(seeded random.Random — no hypothesis shrinking needed here, the
in-suite property test owns minimization) and asserts the same
total-function contract per statement: evaluate, or raise the named
InfluxQLError — never any other exception. Writes a summary JSON to
tmp/INFLUXQL_FUZZ.json.

Usage: python tools/experiments/influxql_fuzz_10k.py [n_statements]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000


def main() -> None:
    from ciws_server_spark.session import get_spark
    from tests.test_influxql_statement_fuzz import (
        NOW,
        check_one,
        gen_statement,
    )

    spark = get_spark("influxql-fuzz")
    rows = [
        (dt.datetime(2024, 1, 1, 6, 0) + dt.timedelta(seconds=4 * i),
         "A" if i % 2 else "B",
         None if i % 7 == 3 else float(i), float(i) * 0.5)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows,
        "time timestamp, buildingID string, flowRate double, tempC double",
    )
    tables = {"campus_flow": df, "campus_flow_hourly": df.limit(10)}

    r = random.Random(20260815)
    t0 = time.time()
    counts = {"ok": 0, "named-error": 0, "ok-executed": 0}
    for i in range(N):
        stmt = gen_statement(r)
        # every ~10th statement that evaluates also EXECUTES (bounded
        # collect) — catches executor-side failures (rlike pattern
        # compile, Arrow folds) the plan-resolve check can't see
        counts[check_one(spark, tables, stmt, execute=(i % 10 == 0))] += 1
        if (i + 1) % 1000 == 0:
            print(
                f"# {i + 1}/{N} ({time.time() - t0:.0f}s) {counts}",
                flush=True,
            )
    out = {
        "statements": N,
        "ok": counts["ok"],
        "ok_executed": counts["ok-executed"],
        "named_error": counts["named-error"],
        "leaked": 0,  # any leak raises AssertionError before this line
        "wall_s": round(time.time() - t0, 1),
        "seed": 20260815,
    }
    os.makedirs("/root/repo/tmp", exist_ok=True)
    with open("/root/repo/tmp/INFLUXQL_FUZZ.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
