import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ciws_server_spark.session import get_spark
import ciws_server_spark.operators.dedup as D

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"
spark = get_spark("minhash-ab")
spark.sparkContext.setLogLevel("ERROR")

xx_band = D.band_signatures  # current (xxhash64) version

def md5_band(docs):
    exploded = docs.select(
        "doc_id",
        F.explode(F.array_distinct(D.word_shingles("text", 3))).alias("shingle"),
    )
    hx = exploded.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(F.md5("shingle"), 17, 8), 16, 10).cast("long").alias("h2"),
    )
    minhash = hx.groupBy("doc_id").agg(
        *[F.min((F.col("h1") + F.lit(k) * F.col("h2")) % F.lit(D._MINHASH_P)).alias(f"mh{k}")
          for k in range(D._NUM_HASHES)]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[F.col(f"mh{k}").cast("string")
                  for k in range(b * D._ROWS_PER_BAND, (b + 1) * D._ROWS_PER_BAND)])
            ).alias("band_hash"),
        )
        for b in range(D._BANDS)
    ]
    return minhash.select("doc_id", F.explode(F.array(*band_structs)).alias("bb")).select(
        "doc_id", "bb.band", "bb.band_hash")

def run_once(variant):
    D.band_signatures = variant
    t0 = time.perf_counter()
    df = D.dedup_minhash_lsh(spark, SF_DIR)
    df.selectExpr("count(*) AS n", f"bit_xor(xxhash64({', '.join(df.columns)})) AS h").collect()
    return time.perf_counter() - t0

from ciws_server_spark.tables import table
table(spark, SF_DIR, "documents").count()
# warm both variants once (codegen)
run_once(md5_band); run_once(xx_band)
md5_t, xx_t = [], []
for i in range(3):
    md5_t.append(run_once(md5_band))
    xx_t.append(run_once(xx_band))
print("md5 bands:", [round(t,2) for t in md5_t], "min", round(min(md5_t),2))
print("xx  bands:", [round(t,2) for t in xx_t], "min", round(min(xx_t),2))
spark.stop()
