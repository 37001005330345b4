import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ciws_server_spark.session import get_spark
from ciws_server_spark.operators.tpch import q1_pricing_summary
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"
spark = get_spark("q1-exp2")
spark.sparkContext.setLogLevel("ERROR")

def cents(col, scale):
    return F.round(F.col(col) * F.lit(10 ** scale)).cast("long")

def q1_salted(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    qty = cents("l_quantity", 0)
    ep_c = cents("l_extendedprice", 2)
    dm = F.lit(100) - cents("l_discount", 2)
    tp = F.lit(100) + cents("l_tax", 2)
    disc_e4 = ep_c * dm
    charge_e6 = disc_e4 * tp
    partial = (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_p"))
        .agg(
            F.sum(qty).alias("s_qty"),
            F.sum(ep_c).alias("s_ep"),
            F.sum(disc_e4).alias("s_disc"),
            F.sum(charge_e6).alias("s_charge"),
            F.sum(cents("l_discount", 2)).alias("s_d"),
            F.count(F.lit(1)).alias("s_n"),
        )
    )
    def dec(c): return F.sum(F.col(c).cast("decimal(38,0)"))
    def emit(sum_col, scale, out_scale=2):
        d = sum_col * F.lit(10 ** -scale).cast(f"decimal({scale+1},{scale})")
        return F.round(d.cast("double"), out_scale)
    n = F.sum("s_n")
    def avg(sum_col, scale):
        d = sum_col * F.lit(10 ** -scale).cast(f"decimal({scale+1},{scale})")
        return F.round(d.cast("double") / n.cast("double"), 6)
    return (
        partial.groupBy("l_returnflag", "l_linestatus")
        .agg(
            emit(dec("s_qty"), 0).alias("sum_qty"),
            emit(dec("s_ep"), 2).alias("sum_base_price"),
            emit(dec("s_disc"), 4).alias("sum_disc_price"),
            emit(dec("s_charge"), 6).alias("sum_charge"),
            avg(dec("s_qty"), 0).alias("avg_qty"),
            avg(dec("s_ep"), 2).alias("avg_price"),
            avg(dec("s_d"), 2).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )

def floor_q(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity")).alias("s"))
        .orderBy("l_returnflag", "l_linestatus")
    )

def run(label, fn, reps=3):
    times = []; rows = None
    for _ in range(reps):
        t0 = time.time(); rows = fn().collect(); times.append(time.time() - t0)
    print(f"{label}: {[round(t,3) for t in sorted(times)]} median={sorted(times)[len(times)//2]:.3f}")
    return rows

table(spark, SF_DIR, "lineitem").count()
rfloor = run("floor(count+1 dblsum)", lambda: floor_q(spark, SF_DIR))
ra = run("A decimal ", lambda: q1_pricing_summary(spark, SF_DIR))
rd = run("D salted  ", lambda: q1_salted(spark, SF_DIR))
print("D bit-identical to A:", [tuple(x) for x in ra] == [tuple(x) for x in rd])
spark.stop()
