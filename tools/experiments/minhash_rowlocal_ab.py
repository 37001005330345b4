"""r14 A/B: row-local MinHash signatures vs the shipped explode/groupBy.

VERDICT r13 ask #1 background: dedup_minhash_lsh's sf100 decade read
~15x for 10x data, all invocations load-flagged; the judge's suspect
was the signature-stage shuffle. Observation: each document is ONE
row, so its shingles are already row-local — the explode -> groupBy
minhash (one exchange of 5M x 16-long rows at sf100, plus the
repartition("doc_id") full-text shuffle before it) can be replaced by
pure array expressions:

    hx  = transform(shingles, s -> (h1(s), h2(s)))
    mhk = array_min(transform(hx, x -> (x.h1 + k*x.h2) % p))

ZERO shuffles in the signature stage; the only exchanges left in the
whole query are the band self-join and the verify joins. Band values
are bit-identical (same md5-derived h1/h2, same modular form), so the
result rows must be EXACTLY the shipped plan's.

Usage: python tools/experiments/minhash_rowlocal_ab.py [sf_dir] [reps]
Writes tmp/MINHASH_ROWLOCAL_AB.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, functions as F

from ciws_server_spark.functions.text import word_shingles
from ciws_server_spark.operators import dedup
from ciws_server_spark.operators.dedup import (
    _BANDS,
    _JACCARD_THRESHOLD,
    _MINHASH_P,
    _NUM_HASHES,
    _ROWS_PER_BAND,
)
from ciws_server_spark.tables import table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
OUT = "tmp/MINHASH_ROWLOCAL_AB.json"


def band_signatures_rowlocal(docs: DataFrame) -> DataFrame:
    hx = F.transform(
        F.array_distinct(word_shingles("text", 3)),
        lambda s: F.struct(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
            .cast("long")
            .alias("h1"),
            F.conv(F.substring(F.md5(s), 17, 8), 16, 10)
            .cast("long")
            .alias("h2"),
        ),
    )
    with_h = docs.select("doc_id", hx.alias("hx")).where(F.size("hx") > 0)
    minhash = with_h.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(
                    "hx",
                    lambda x, k=k: (x["h1"] + F.lit(k) * x["h2"])
                    % F.lit(_MINHASH_P),
                )
            ).alias(f"mh{k}")
            for k in range(_NUM_HASHES)
        ],
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[
                    F.col(f"mh{k}")
                    for k in range(
                        b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND
                    )
                ]
            ).alias("band_hash"),
        )
        for b in range(_BANDS)
    ]
    return minhash.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "bb.band", "bb.band_hash")


def minhash_rowlocal(spark, sf_dir) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bands = band_signatures_rowlocal(docs).localCheckpoint(eager=True)
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    with_sh = docs.join(F.broadcast(cand_docs), "doc_id").select(
        "doc_id",
        F.array_distinct(word_shingles("text", 3)).alias("shingles"),
    ).localCheckpoint(eager=True)
    wa = with_sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa")
    )
    wb = with_sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb")
    )
    pairs = candidates.join(wa, "doc_a").join(wb, "doc_b")
    n_common = F.size(F.array_intersect("sa", "sb"))
    na, nb = F.size("sa"), F.size("sb")
    jac = n_common.cast("double") / (na + nb - n_common).cast("double")
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def consume(df) -> float:
    t = time.perf_counter()
    df.selectExpr(
        "count(*) AS n",
        f"bit_xor(xxhash64({', '.join(df.columns)})) AS h",
    ).collect()
    return time.perf_counter() - t


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("minhash-rowlocal-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # identity first: same pair set, same jaccards (sorted compare)
    a = sorted(
        map(tuple, dedup.dedup_minhash_lsh(spark, SF_DIR).collect())
    )
    b = sorted(map(tuple, minhash_rowlocal(spark, SF_DIR).collect()))
    identical = a == b
    print(f"identity: {identical} ({len(a)} vs {len(b)} pairs)", flush=True)

    times = {"shipped": [], "rowlocal": []}
    for r in range(REPS):
        times["shipped"].append(
            round(consume(dedup.dedup_minhash_lsh(spark, SF_DIR)), 3)
        )
        times["rowlocal"].append(
            round(consume(minhash_rowlocal(spark, SF_DIR)), 3)
        )
        print(f"rep{r}: {times}", flush=True)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    out = {
        "sf_dir": SF_DIR,
        "identity": identical,
        "n_pairs": len(a),
        "median": {k: med(v) for k, v in times.items()},
        "all": times,
    }
    os.makedirs("tmp", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["median"]))
    spark.stop()


if __name__ == "__main__":
    main()
