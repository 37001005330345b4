import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ciws_server_spark.session import get_spark
import ciws_server_spark.operators.dedup as D
from ciws_server_spark.functions.text import word_shingles
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"
spark = get_spark("mh-prof2")
spark.sparkContext.setLogLevel("ERROR")
docs = table(spark, SF_DIR, "documents").repartition("doc_id")
docs.count()

t0 = time.time()
bands = D.band_signatures(docs).localCheckpoint(eager=True)
print(f"bands build+ckpt: {time.time()-t0:.2f}s rows={bands.count()}")

a = bands.alias("a"); b = bands.alias("b")
t0 = time.time()
candidates = (
    a.join(b, (F.col("a.band") == F.col("b.band"))
             & (F.col("a.band_hash") == F.col("b.band_hash"))
             & (F.col("a.doc_id") < F.col("b.doc_id")))
    .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    .distinct()
).localCheckpoint(eager=True)
print(f"bucket self-join+distinct+ckpt: {time.time()-t0:.2f}s candidates={candidates.count()}")

t0 = time.time()
cand_docs = (candidates.select(F.col("doc_a").alias("doc_id"))
    .union(candidates.select(F.col("doc_b").alias("doc_id"))).distinct())
with_sh = docs.join(F.broadcast(cand_docs), "doc_id").select(
    "doc_id", F.array_distinct(word_shingles("text", 3)).alias("shingles")
).localCheckpoint(eager=True)
print(f"cand shingle derive+ckpt: {time.time()-t0:.2f}s cand_docs rows={with_sh.count()}")

t0 = time.time()
sh = with_sh.select("doc_id", F.explode("shingles").alias("shingle"))
sizes = with_sh.select("doc_id", F.size("shingles").alias("n_shingles"))
a2 = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
b2 = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
common = (a2.join(F.broadcast(candidates), "doc_a").join(b2, ["doc_b", "shingle"])
    .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_common")))
n = common.count()
print(f"verify common-join: {time.time()-t0:.2f}s common rows={n}")
spark.stop()
