"""Round-8: window_running_revenue DECIMAL vs long fixed-point at sf10."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ciws_server_spark.session import get_spark
from ciws_server_spark.functions.scalar import fixed_point
from ciws_server_spark.operators.tpch import window_running_revenue
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"
spark = get_spark("win-fp")
spark.sparkContext.setLogLevel("ERROR")


def window_long(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    rev_e4 = fixed_point("l_extendedprice", 2) * (
        F.lit(100) - fixed_point("l_discount", 2)
    )
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber",
            "l_extendedprice", "l_discount",
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run_e4 = F.sum(rev_e4).over(w)
    cents = F.floor((run_e4 + F.lit(50)).cast("double") / F.lit(100.0))
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (cents / F.lit(100.0)).alias("running_revenue"),
    )


def consume(df):
    return df.selectExpr(
        "count(*) AS n",
        f"bit_xor(xxhash64({', '.join(df.columns)})) AS h",
    ).collect()[0]


def run(label, fn, reps=3):
    times, out = [], None
    for _ in range(reps):
        t0 = time.time()
        out = consume(fn(spark, SF_DIR))
        times.append(time.time() - t0)
    ts = sorted(times)
    print(f"{label}: {[round(t,2) for t in ts]} median={ts[len(ts)//2]:.3f} n={out['n']} h={out['h']}")
    return out


table(spark, SF_DIR, "lineitem").count()
ra = run("A decimal", window_running_revenue)
rb = run("B long-fp", window_long)
print("hash-identical:", (ra["n"], ra["h"]) == (rb["n"], rb["h"]))
spark.stop()
