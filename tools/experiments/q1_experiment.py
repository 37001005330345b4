"""Round-8 experiment: q1 decimal-agg vs long-micros accumulation at sf10.

Variants:
  A: current production q1 (decimal(30,6) sums via dsum/davg)
  B: long micros via ROUND(c*1e6) cast long, plain long sums
  C: same micros, sums as decimal(38,0) (overflow-safe promotion)

Checks bit-identity of B/C against A on the same data.
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from ciws_server_spark.session import get_spark
from ciws_server_spark.operators.tpch import q1_pricing_summary
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"
spark = get_spark("q1-exp")
spark.sparkContext.setLogLevel("ERROR")


def cents(col, scale):
    """double -> long fixed-point at 10^scale (exact for <=scale dp data)."""
    return F.round(F.col(col) * F.lit(10 ** scale)).cast("long")


def q1_long(spark, sf_dir, decimal_sums=False):
    l = table(spark, sf_dir, "lineitem")
    qty = cents("l_quantity", 0)           # integer quantities
    ep_c = cents("l_extendedprice", 2)     # cents
    dm = F.lit(100) - cents("l_discount", 2)   # (1-d) in centi
    tp = F.lit(100) + cents("l_tax", 2)        # (1+t) in centi
    disc_e4 = ep_c * dm                    # scale-4 fixed point
    charge_e6 = disc_e4 * tp               # scale-6 fixed point
    if decimal_sums:
        s = lambda c: F.sum(c.cast("decimal(38,0)"))
        as_dec = lambda c: c
    else:
        s = F.sum
        as_dec = lambda c: c.cast("decimal(38,0)")

    def emit(sum_col, scale, out_scale=2):
        # exact: long/decimal sum -> decimal -> shift scale -> double
        d = as_dec(sum_col) * F.lit(10 ** -scale).cast(f"decimal({scale+1},{scale})")
        return F.round(d.cast("double"), out_scale)

    n = F.count(F.lit(1))

    def avg(sum_col, scale):
        d = as_dec(sum_col) * F.lit(10 ** -scale).cast(f"decimal({scale+1},{scale})")
        return F.round(d.cast("double") / n.cast("double"), 6)

    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            emit(s(qty), 0).alias("sum_qty"),
            emit(s(ep_c), 2).alias("sum_base_price"),
            emit(s(disc_e4), 4).alias("sum_disc_price"),
            emit(s(charge_e6), 6).alias("sum_charge"),
            avg(s(qty), 0).alias("avg_qty"),
            avg(s(ep_c), 2).alias("avg_price"),
            avg(s(cents("l_discount", 2)), 2).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def run(label, fn, reps=3):
    times = []
    rows = None
    for _ in range(reps):
        t0 = time.time()
        rows = fn().collect()
        times.append(time.time() - t0)
    print(f"{label}: {sorted(times)} median={sorted(times)[len(times)//2]:.3f}")
    return rows


# warm the scan cache once
table(spark, SF_DIR, "lineitem").count()

ra = run("A decimal", lambda: q1_pricing_summary(spark, SF_DIR))
rb = run("B long   ", lambda: q1_long(spark, SF_DIR, decimal_sums=False))
rc = run("C dec38,0", lambda: q1_long(spark, SF_DIR, decimal_sums=True))

for name, r in (("B", rb), ("C", rc)):
    same = [tuple(x) for x in ra] == [tuple(x) for x in r]
    print(f"{name} bit-identical to A: {same}")
    if not same:
        for x, y in zip(ra, r):
            if tuple(x) != tuple(y):
                print("  A:", x)
                print(f"  {name}:", y)
spark.stop()
# appended: variant D (salted two-stage) + scan floor — run separately
