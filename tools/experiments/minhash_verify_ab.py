import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ciws_server_spark.session import get_spark
import ciws_server_spark.operators.dedup as D
from ciws_server_spark.functions.text import word_shingles
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf10"
spark = get_spark("mh-ab2")
spark.sparkContext.setLogLevel("ERROR")
docs = table(spark, SF_DIR, "documents").repartition("doc_id")
docs.count()
bands = D.band_signatures(docs).localCheckpoint(eager=True)
a = bands.alias("a"); b = bands.alias("b")
candidates = (
    a.join(b, (F.col("a.band") == F.col("b.band"))
             & (F.col("a.band_hash") == F.col("b.band_hash"))
             & (F.col("a.doc_id") < F.col("b.doc_id")))
    .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    .distinct()
).localCheckpoint(eager=True)
cand_docs = (candidates.select(F.col("doc_a").alias("doc_id"))
    .union(candidates.select(F.col("doc_b").alias("doc_id"))).distinct())
with_sh = docs.join(F.broadcast(cand_docs), "doc_id").select(
    "doc_id", F.array_distinct(word_shingles("text", 3)).alias("shingles")
).localCheckpoint(eager=True)
print("candidates:", candidates.count(), "cand docs:", with_sh.count())

def old_verify():
    sh = with_sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a2 = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b2 = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (a2.join(F.broadcast(candidates), "doc_a").join(b2, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_common")))
    sizes = with_sh.select("doc_id", F.size("shingles").alias("n_shingles"))
    sa = F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")))
    sb = F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double")
    return (common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= D._JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard"))

def new_verify():
    wa = with_sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    wb = with_sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    pairs = candidates.join(wa, "doc_a").join(wb, "doc_b")
    n_common = F.size(F.array_intersect("sa", "sb"))
    na, nb = F.size("sa"), F.size("sb")
    jac = n_common.cast("double") / (na + nb - n_common).cast("double")
    return (pairs.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= D._JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard"))

def consume(df):
    return df.selectExpr("count(*) n", "bit_xor(xxhash64(doc_a, doc_b, jaccard)) h").collect()[0]

def t(label, fn, reps=2):
    best, out = 1e9, None
    for _ in range(reps):
        t0 = time.time(); out = consume(fn()); best = min(best, time.time() - t0)
    print(f"{label}: {best:.2f}s n={out['n']} h={out['h']}")
    return out

o = t("old explode-join verify", old_verify)
n = t("new array_intersect verify", new_verify)
print("identical:", (o["n"], o["h"]) == (n["n"], n["h"]))
spark.stop()
