import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ciws_server_spark.session import get_spark
import ciws_server_spark.operators.dedup as D
from ciws_server_spark.functions.text import word_shingles
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"
spark = get_spark("mh-prof")
spark.sparkContext.setLogLevel("ERROR")
docs = table(spark, SF_DIR, "documents").repartition("doc_id")
docs.count()

def t(label, fn, reps=2):
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); fn(); best = min(best, time.time() - t0)
    print(f"{label}: {best:.2f}s")

# stage A: shingle explode only
exploded = docs.select("doc_id", F.explode(F.array_distinct(word_shingles("text", 3))).alias("shingle"))
t("A shingle explode + count", lambda: exploded.selectExpr("count(*)").collect())
# stage B: + md5 + h1/h2
hx = exploded.select(
    "doc_id",
    F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long").alias("h1"),
    F.conv(F.substring(F.md5("shingle"), 17, 8), 16, 10).cast("long").alias("h2"),
)
t("B +md5+conv", lambda: hx.selectExpr("count(*)", "bit_xor(h1)", "bit_xor(h2)").collect())
# stage C: full signatures (16 mins)
minhash = hx.groupBy("doc_id").agg(*[F.min((F.col("h1") + F.lit(k) * F.col("h2")) % F.lit(D._MINHASH_P)).alias(f"mh{k}") for k in range(D._NUM_HASHES)])
t("C +groupBy 16 mins", lambda: minhash.selectExpr("count(*)", "bit_xor(mh0)").collect())
# stage D: full band_signatures
t("D band_signatures", lambda: D.band_signatures(docs).selectExpr("count(*)", "bit_xor(band_hash)").collect())
# full query for reference
t("E full dedup_minhash_lsh", lambda: D.dedup_minhash_lsh(spark, SF_DIR).selectExpr("count(*)").collect(), reps=1)
spark.stop()
