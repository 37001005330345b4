"""Fresh-process cost of one dedup_minhash_lsh variant (r14 follow-up).

The row-local transform/array_min form killed the sf100 shuffle cliff
but pays a large fresh-JVM warm-up (higher-order functions are not
whole-stage-codegen'd; 16 array_min(transform) nodes JIT slowly) —
the sf1 gate window read minhash 4.2s -> 14.1s. This runner measures
ONE variant in THIS process (drive it once per variant from a shell
loop so every reading is fresh-JVM, the graded condition):

  shipped   operators.dedup.dedup_minhash_lsh as currently shipped
  explode   r13's explode -> groupBy(16 mins), WITHOUT the
            repartition("doc_id") text shuffle
  fold      one F.aggregate pass with a 16-field struct accumulator
            (1 HOF lambda instead of 32)

Usage: python tools/experiments/minhash_variant_bench.py VARIANT SF_DIR
Prints one JSON line {"variant", "sf_dir", "cold", "warm"}.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from ciws_server_spark.functions.text import word_shingles
from ciws_server_spark.operators import dedup
from ciws_server_spark.operators.dedup import (
    _BANDS,
    _JACCARD_THRESHOLD,
    _MINHASH_P,
    _NUM_HASHES,
    _ROWS_PER_BAND,
)
from ciws_server_spark.session import get_spark
from ciws_server_spark.tables import table

VARIANT = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "tmp/sf1"


def _bands_from_minhash(minhash: DataFrame) -> DataFrame:
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


def band_signatures_explode(docs: DataFrame) -> DataFrame:
    exploded = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles("text", 3))).alias(
            "shingle"
        ),
    )
    hx = exploded.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
        .cast("long")
        .alias("h1"),
        F.conv(F.substring(F.md5("shingle"), 17, 8), 16, 10)
        .cast("long")
        .alias("h2"),
    )
    minhash = hx.groupBy("doc_id").agg(
        *[
            F.min(
                (F.col("h1") + F.lit(k) * F.col("h2")) % F.lit(_MINHASH_P)
            ).alias(f"mh{k}")
            for k in range(_NUM_HASHES)
        ]
    )
    return _bands_from_minhash(minhash)


def band_signatures_fold(docs: DataFrame) -> DataFrame:
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
    acc0 = F.struct(
        *[F.lit(_MINHASH_P).alias(f"m{k}") for k in range(_NUM_HASHES)]
    )
    folded = F.aggregate(
        "hx",
        acc0,
        lambda acc, x: F.struct(
            *[
                F.least(
                    acc[f"m{k}"],
                    (x["h1"] + F.lit(k) * x["h2"]) % F.lit(_MINHASH_P),
                ).alias(f"m{k}")
                for k in range(_NUM_HASHES)
            ]
        ),
    )
    with_h = docs.select("doc_id", hx.alias("hx")).where(F.size("hx") > 0)
    minhash = with_h.select("doc_id", folded.alias("m")).select(
        "doc_id",
        *[F.col("m")[f"m{k}"].alias(f"mh{k}") for k in range(_NUM_HASHES)],
    )
    return _bands_from_minhash(minhash)


def query_with(band_fn, spark, sf_dir) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bands = band_fn(docs).localCheckpoint(eager=True)
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


def main():
    spark = get_spark(f"minhash-{VARIANT}")
    spark.sparkContext.setLogLevel("ERROR")
    if VARIANT == "r13":
        fn = lambda s, d: query_with(
            lambda docs: band_signatures_explode(
                docs.repartition("doc_id")
            ),
            s,
            d,
        )
    elif VARIANT == "shipped":
        fn = lambda s, d: dedup.dedup_minhash_lsh(s, d)
    elif VARIANT == "rowlocal_repart":
        # row-local signatures, but spread the text across the
        # executors first: a small corpus is one parquet split, so
        # without this ALL the array-fold work runs on one core
        fn = lambda s, d: query_with(
            lambda docs: dedup.band_signatures(
                docs.repartition("doc_id")
            ),
            s,
            d,
        )
    elif VARIANT == "explode":
        fn = lambda s, d: query_with(band_signatures_explode, s, d)
    elif VARIANT == "fold":
        fn = lambda s, d: query_with(band_signatures_fold, s, d)
    else:
        raise SystemExit(f"unknown variant {VARIANT!r}")

    def consume():
        # timer BEFORE construction: the eager localCheckpoints run
        # the signature pipeline at DataFrame-build time
        t = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.selectExpr(
            "count(*) AS n",
            "bit_xor(xxhash64(doc_a, doc_b, jaccard)) AS h",
        ).collect()
        return time.perf_counter() - t

    cold = consume()
    warm = min(consume(), consume())
    print(json.dumps({
        "variant": VARIANT, "sf_dir": SF_DIR,
        "cold": round(cold, 3), "warm": round(warm, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
