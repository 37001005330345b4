"""InfluxQL 1.x conformance checklist: execute ONE statement of every
supported kind against a scratch store and report per-statement
status — the auditable, one-command form of SURVEY §2.11's surface
claim. Writes tmp/CONFORMANCE.json.

Usage: python tools/influxql_conformance.py
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

NOW = dt.datetime(2024, 6, 1, 12, 0)


def statements() -> list[tuple[str, str]]:
    """(family, statement). Every statement must evaluate (not raise)."""
    return [
        # --- core SELECT surface
        ("select", "SELECT flowRate FROM campus_flow"),
        ("select", "SELECT \"flowRate\", tempC FROM campus_flow "
                   "WHERE buildingID = 'A' AND time >= '2024-01-01' "
                   "AND time < '2024-02-01'"),
        ("select", "SELECT * FROM campus_flow LIMIT 3 OFFSET 1"),
        ("select", "SELECT flowRate FROM campus_flow ORDER BY time DESC "
                   "LIMIT 2"),
        ("select", "SELECT flowRate FROM /^campus/"),
        ("select", "SELECT flowRate FROM campus_flow, campus_b"),
        ("select", "SELECT flowRate FROM ciws.autogen.campus_flow"),
        ("select", "SELECT mean(flowRate) FROM campus_flow "
                   "GROUP BY time(1h), buildingID"),
        ("select", "SELECT mean(flowRate) FROM campus_flow GROUP BY *"),
        ("select", "SELECT count(value_missing) FROM campus_flow "
                   "GROUP BY time(1h)"),
        ("select", "SELECT mean(flowRate) FROM campus_flow WHERE "
                   "time >= '2024-01-01' AND time < '2024-01-02' "
                   "GROUP BY time(1h) fill(0)"),
        ("select", "SELECT mean(flowRate) FROM campus_flow WHERE "
                   "time >= '2024-01-01' AND time < '2024-01-02' "
                   "GROUP BY time(1h) fill(linear)"),
        ("select", "SELECT mean(flowRate) FROM campus_flow WHERE "
                   "time >= '2024-01-01' AND time < '2024-01-02' "
                   "GROUP BY time(1h) fill(previous)"),
        ("select", "SELECT mean(flowRate) FROM campus_flow "
                   "GROUP BY time(1w), buildingID SLIMIT 1 SOFFSET 0"),
        ("select", "SELECT mean(flowRate) FROM campus_flow "
                   "WHERE time > now() - 30d GROUP BY time(1d)"),
        ("select", "SELECT mean(flowRate) FROM campus_flow "
                   "GROUP BY time(1mo)"),
        ("select", "SELECT mean(flowRate) FROM campus_flow "
                   "GROUP BY time(1h) tz('America/Denver')"),
        ("select", "SELECT mean(flowRate) FROM "
                   "(SELECT flowRate FROM campus_flow WHERE "
                   "buildingID = 'A')"),
        # aggregates / selectors
        ("aggregate", "SELECT count(flowRate), sum(flowRate), "
                      "min(flowRate), max(flowRate), mean(flowRate) "
                      "FROM campus_flow"),
        ("aggregate", "SELECT first(flowRate), last(flowRate), "
                      "spread(flowRate), stddev(flowRate), "
                      "median(flowRate), mode(buildingID) "
                      "FROM campus_flow"),
        ("aggregate", "SELECT percentile(flowRate, 90) FROM campus_flow"),
        ("aggregate", "SELECT count(distinct(buildingID)) FROM campus_flow"),
        ("aggregate", "SELECT distinct(buildingID) FROM campus_flow"),
        ("aggregate", "SELECT integral(flowRate, 1h) FROM campus_flow"),
        ("aggregate", "SELECT mean(*) FROM campus_flow"),
        ("selector", "SELECT top(flowRate, 2) FROM campus_flow"),
        ("selector", "SELECT bottom(flowRate, buildingID, 1) "
                     "FROM campus_flow"),
        ("selector", "SELECT sample(flowRate, 2) FROM campus_flow"),
        ("selector", "SELECT max(flowRate), buildingID, tempC "
                     "FROM campus_flow"),
        ("selector", "SELECT percentile(flowRate, 50), buildingID "
                     "FROM campus_flow"),
        # transforms / TA
        ("transform", "SELECT derivative(mean(flowRate), 1h) FROM "
                      "campus_flow GROUP BY time(1h)"),
        ("transform", "SELECT non_negative_derivative(flowRate) "
                      "FROM campus_flow"),
        ("transform", "SELECT difference(flowRate) FROM campus_flow"),
        ("transform", "SELECT cumulative_sum(flowRate) FROM campus_flow"),
        ("transform", "SELECT elapsed(flowRate, 1m) FROM campus_flow"),
        ("transform", "SELECT moving_average(flowRate, 2) "
                      "FROM campus_flow"),
        ("transform", "SELECT exponential_moving_average(flowRate, 2) "
                      "FROM campus_flow"),
        ("transform", "SELECT relative_strength_index(flowRate, 2) "
                      "FROM campus_flow"),
        ("transform", "SELECT chande_momentum_oscillator(flowRate, 2) "
                      "FROM campus_flow"),
        ("transform", "SELECT kaufmans_efficiency_ratio(flowRate, 2) "
                      "FROM campus_flow"),
        ("transform", "SELECT kaufmans_adaptive_moving_average("
                      "flowRate, 2) FROM campus_flow"),
        ("transform", "SELECT double_exponential_moving_average("
                      "flowRate, 2) FROM campus_flow"),
        ("transform", "SELECT triple_exponential_moving_average("
                      "flowRate, 2) FROM campus_flow"),
        ("transform", "SELECT triple_exponential_derivative("
                      "flowRate, 2) FROM campus_flow"),
        ("transform", "SELECT holt_winters(mean(flowRate), 2, 0) "
                      "FROM campus_flow WHERE time >= '2024-01-01' "
                      "AND time < '2024-01-02' GROUP BY time(6h)"),
        # arithmetic + math
        ("math", "SELECT flowRate + tempC, (flowRate - tempC) / 2 AS d2 "
                 "FROM campus_flow"),
        ("math", "SELECT mean(flowRate) * 2 + 1 FROM campus_flow"),
        ("math", "SELECT abs(flowRate), sqrt(flowRate), "
                 "pow(flowRate, 2) AS sq FROM campus_flow"),
        ("math", "SELECT round(mean(flowRate)) FROM campus_flow "
                 "GROUP BY time(1h)"),
        ("math", "SELECT log(flowRate, 2), ln(flowRate), log2(flowRate), "
                 "log10(flowRate) FROM campus_flow"),
        ("math", "SELECT sin(flowRate), cos(flowRate), tan(flowRate), "
                 "asin(tempC), acos(tempC), atan(flowRate), "
                 "atan2(flowRate, tempC) FROM campus_flow"),
        ("math", "SELECT ceil(flowRate), floor(flowRate), "
                 "exp(tempC), -flowRate AS neg FROM campus_flow"),
        # predicates
        ("where", "SELECT flowRate FROM campus_flow WHERE "
                  "buildingID =~ /^[AB]$/ AND flowRate > 0"),
        ("where", "SELECT flowRate FROM campus_flow WHERE "
                  "(buildingID = 'A' OR buildingID = 'B') "
                  "AND time >= 1704067200000000000"),
        # SHOW family
        ("show", "SHOW DATABASES"),
        ("show", "SHOW MEASUREMENTS"),
        ("show", "SHOW MEASUREMENTS WITH MEASUREMENT =~ /^campus/"),
        ("show", "SHOW MEASUREMENTS LIMIT 1 OFFSET 1"),
        ("show", "SHOW SERIES"),
        ("show", "SHOW SERIES FROM campus_flow WHERE buildingID = 'A'"),
        ("show", "SHOW TAG KEYS"),
        ("show", "SHOW TAG KEYS FROM campus_flow"),
        ("show", "SHOW TAG VALUES WITH KEY = buildingID"),
        ("show", "SHOW TAG VALUES FROM campus_flow WITH KEY IN "
                 "(buildingID) LIMIT 2"),
        ("show", "SHOW TAG VALUES WITH KEY =~ /building/"),
        ("show", "SHOW FIELD KEYS FROM campus_flow"),
        ("show", "SHOW SERIES CARDINALITY"),
        ("show", "SHOW SERIES EXACT CARDINALITY"),
        ("show", "SHOW MEASUREMENT CARDINALITY"),
        ("show", "SHOW TAG KEY CARDINALITY"),
        ("show", "SHOW TAG VALUES CARDINALITY WITH KEY = buildingID"),
        ("show", "SHOW FIELD KEY EXACT CARDINALITY FROM campus_flow"),
        ("show", "SHOW RETENTION POLICIES"),
        ("show", "SHOW CONTINUOUS QUERIES"),
        ("show", "SHOW USERS"),
        ("show", "SHOW GRANTS FOR conf_user"),
        ("show", "SHOW SHARDS"),
        ("show", "SHOW SHARD GROUPS"),
        ("show", "SHOW QUERIES"),
        ("show", "SHOW STATS"),
        ("show", "SHOW DIAGNOSTICS"),
        ("show", "SHOW SUBSCRIPTIONS"),
        # EXPLAIN
        ("explain", "EXPLAIN SELECT mean(flowRate) FROM campus_flow "
                    "GROUP BY time(1h)"),
        ("explain", "EXPLAIN ANALYZE SELECT flowRate FROM campus_flow"),
        # write/admin plane
        ("write", "SELECT mean(flowRate) INTO conf_rollup FROM "
                  "campus_flow WHERE time >= '2024-01-01' AND "
                  "time < '2024-01-08' GROUP BY time(1d)"),
        ("write", "SELECT mean(flowRate) INTO :MEASUREMENT FROM "
                  "/^conf_rollup$/ GROUP BY time(7d)"),
        ("write", "DELETE FROM conf_rollup WHERE time < '2024-01-02'"),
        ("write", "DELETE FROM /conf_/ WHERE time < '2024-01-03'"),
        ("write", "DELETE WHERE buildingID = 'nope'"),
        ("write", "DROP SERIES FROM conf_rollup"),
        ("write", "DROP SERIES WHERE buildingID = 'nope'"),
        ("write", "DROP MEASUREMENT conf_rollup"),
        ("admin", "CREATE DATABASE ciws"),
        ("admin", "CREATE RETENTION POLICY conf_rp ON ciws DURATION 30d "
                  "REPLICATION 1 SHARD DURATION 7d"),
        ("admin", "ALTER RETENTION POLICY conf_rp ON ciws DURATION 60d"),
        ("admin", "DROP RETENTION POLICY conf_rp ON ciws"),
        ("admin", "CREATE CONTINUOUS QUERY conf_cq ON ciws "
                  "RESAMPLE EVERY 1h FOR 2h BEGIN SELECT "
                  "mean(flowRate) INTO conf_hourly FROM campus_flow "
                  "GROUP BY time(1h) END"),
        ("admin", "DROP CONTINUOUS QUERY conf_cq"),
        ("admin", "CREATE USER conf_user WITH PASSWORD 'pw'"),
        ("admin", "SET PASSWORD FOR conf_user = 'pw2'"),
        ("admin", "GRANT READ ON ciws TO conf_user"),
        ("admin", "REVOKE READ ON ciws FROM conf_user"),
        ("admin", "GRANT ALL PRIVILEGES TO conf_user"),
        ("admin", "CREATE SUBSCRIPTION \"conf_sub\" ON ciws.\"autogen\" "
                  "DESTINATIONS ALL 'http://example:9090'"),
        ("admin", "DROP SUBSCRIPTION \"conf_sub\" ON ciws.\"autogen\""),
        ("admin", "DROP SHARD 1"),
        ("admin", "DROP USER conf_user"),
    ]


def main() -> int:
    from ciws_server_spark.plans.influxql import (
        InfluxQLError,
        run_influxql,
    )
    from ciws_server_spark.session import get_spark
    from ciws_server_spark.sources import sinks
    from pyspark.sql import DataFrame

    spark = get_spark("influxql-conformance")
    td = tempfile.mkdtemp(prefix="conf_store_")
    rows = [
        (dt.datetime(2024, 1, 1 + i // 4, 6 + (i % 4) * 3),
         "AB"[i % 2], 1.0 + i * 0.25, 15.0 + (i % 5) * 0.1)
        for i in range(24)
    ]
    df = spark.createDataFrame(
        rows,
        "time timestamp, buildingID string, flowRate double, "
        "tempC double",
    )
    sinks.append_points(df, td, "campus_flow")
    sinks.append_points(df.limit(6), td, "campus_b")

    # ordering note: SHOW GRANTS / DROP USER rows need conf_user to
    # exist — the list interleaves admin creates before dependent
    # statements via two passes (admin first where needed is encoded
    # by running CREATE USER before the SHOW family below)
    todo = statements()
    # hoist user creation before SHOW GRANTS
    todo.sort(key=lambda fs: 0 if fs[1].startswith("CREATE USER") else 1)

    report, failures = [], 0
    t0 = time.time()
    for family, stmt in todo:
        try:
            res = run_influxql(
                spark,
                sinks.load_tables(spark, td),
                stmt,
                table_dir=td,
                now=NOW,
            )
            if isinstance(res, DataFrame):
                n = res.count()
                status = f"ok rows={n}"
            else:
                status = f"ok -> {res!r}"
            report.append(
                {"family": family, "statement": stmt, "status": status}
            )
        except InfluxQLError as exc:
            failures += 1
            report.append(
                {
                    "family": family,
                    "statement": stmt,
                    "status": f"NAMED-ERROR: {exc}",
                }
            )
        except Exception as exc:  # pragma: no cover
            failures += 1
            report.append(
                {
                    "family": family,
                    "statement": stmt,
                    "status": f"LEAK {type(exc).__name__}: {exc}",
                }
            )
    out = {
        "statements": len(report),
        "executed_ok": len(report) - failures,
        "failures": failures,
        "wall_s": round(time.time() - t0, 1),
        "report": report,
    }
    os.makedirs("/root/repo/tmp", exist_ok=True)
    with open("/root/repo/tmp/CONFORMANCE.json", "w") as fh:
        json.dump(out, fh, indent=1)
    for r in report:
        mark = "  " if r["status"].startswith("ok") else "!!"
        print(f"{mark} [{r['family']}] {r['statement'][:72]} :: "
              f"{r['status'][:60]}")
    print(f"\n{out['executed_ok']}/{out['statements']} executed ok")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
