"""Candidate-growth vs geometry for dedup_minhash_lsh (r15, VERDICT
r14 ask #2).

The diagnosed scale-killer: at the fixed 16-hash/4-band geometry the
LSH candidate:true ratio grows 1.6:1 (sf10) → 44:1 (sf100) and the
exact-verify floor Σ_pairs(|sa|+|sb|) dominates the decade slope.
This runner measures ONE (rows_per_band, bands) geometry in ONE fresh
JVM: candidate count, verified-pair count, and the wall cost of the
full query, so the size-adaptive rungs can be derived from data
rather than guessed.

Usage: python tools/experiments/minhash_geometry_ab.py rR_bB SF_DIR
e.g.   python tools/experiments/minhash_geometry_ab.py r5_b4 tmp/sf10

Prints one JSON line:
  {"geometry", "sf_dir", "n_candidates", "n_true", "cold", "warm"}
"""
from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ciws_server_spark.operators import dedup
from ciws_server_spark.session import get_spark
from ciws_server_spark.tables import table

GEOM = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "tmp/sf10"

m = re.fullmatch(r"r(\d+)_b(\d+)", GEOM)
if not m:
    raise SystemExit(f"geometry must look like r4_b4, got {GEOM!r}")
ROWS_PER_BAND, BANDS = int(m.group(1)), int(m.group(2))


def main():
    spark = get_spark(f"minhash-geom-{GEOM}")
    spark.sparkContext.setLogLevel("ERROR")
    n_cand_holder = {}

    def run():
        t = time.perf_counter()
        docs = table(spark, SF_DIR, "documents")
        src = docs.repartition("doc_id")  # spread: measure compute,
        # not split-starved parallelism (matches the operator's own
        # splits<cores spread at these fixture sizes)
        bands = dedup.band_signatures(
            src, geometry=(ROWS_PER_BAND * BANDS, BANDS)
        ).localCheckpoint(eager=True)
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
        n_cand = candidates.count()
        from ciws_server_spark.functions.text import word_shingles

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
        out = (
            pairs.withColumn("jaccard", F.round(jac, 6))
            .where(F.col("jaccard") >= dedup._JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", "jaccard")
        )
        n_true = out.count()
        wall = time.perf_counter() - t
        n_cand_holder["cand"], n_cand_holder["true"] = n_cand, n_true
        return wall

    cold = run()
    warm = min(run(), run())
    print(json.dumps({
        "geometry": GEOM, "sf_dir": SF_DIR,
        "n_candidates": n_cand_holder["cand"],
        "n_true": n_cand_holder["true"],
        "cold": round(cold, 3), "warm": round(warm, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
