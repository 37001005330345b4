"""Streaming near-dup per-batch cost vs corpus-index size (round-9
verdict ask #6).

Claim under test (streaming/dedup.py module docstring): per-batch cost
is O(batch × bucket collisions) — the corpus index contributes a scan,
not a shuffle, so a 10× index should grow per-batch latency by far
less than 10× (the scan term), and the candidate/verify stages not at
all (collisions per batch doc are corpus-rate-bound by construction of
the scale fixtures: replicas are shingle-disjoint, so bucket load per
band key stays flat).

Protocol: ONE JVM, interleaved A/B/A/B... (methodology contract in
README.md). Index 1× = sf0.01 documents (5k docs), index 10× = sf0.1
documents (50k docs); both PERSISTED to parquet first (the production
shape — the stream joins a parquet index, not a recomputed one). The
probe batch is 500 docs sampled from OUTSIDE both corpora (doc_id
offset) so candidate sets are comparable. Reported: median of 3
interleaved reps per side, result row count + value fold to pin
identity of the answer across reps.

Usage: python tools/experiments/streaming_index_ab.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from ciws_server_spark.session import get_spark
    from ciws_server_spark.operators.dedup import band_signatures
    from ciws_server_spark.streaming.dedup import near_dups_against_corpus

    spark = get_spark(
        "stream-index-ab", master="local[32]", shuffle_partitions=32
    )
    base = tempfile.mkdtemp()

    # corpus 10x ⊇ corpus 1x (sf0.1 docs id-offset to avoid clashes):
    # the probe's TRUE matches all live in the shared 1x subset, so
    # verify work is held constant across sides and the A/B isolates
    # the index-size term (scan + incidental bucket collisions)
    docs_1x = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs_10x = docs_1x.unionByName(
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    corpora = {}
    for label, docs in (("1x", docs_1x), ("10x", docs_10x)):
        docs = docs.select("doc_id", "text").localCheckpoint(eager=True)
        idx_path = os.path.join(base, f"idx_{label}")
        band_signatures(docs).write.parquet(idx_path)
        corpora[label] = (docs, idx_path)
        n = spark.read.parquet(idx_path).count()
        print(f"# index {label}: {n} rows at {idx_path}", flush=True)

    # probe batch: 500 docs from the SHARED 1x subset re-labeled far
    # outside both id spaces — guaranteed near-dups on both sides
    batch = (
        docs_1x.orderBy("doc_id")
        .limit(500)
        .select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
        )
        .localCheckpoint(eager=True)
    )
    print(f"# probe batch: {batch.count()} docs", flush=True)

    times: dict[str, list[float]] = {"1x": [], "10x": []}
    folds: dict[str, set] = {"1x": set(), "10x": set()}
    for rep in range(reps):
        for label in ("1x", "10x"):
            docs, idx_path = corpora[label]
            idx = spark.read.parquet(idx_path)
            t0 = time.perf_counter()
            out = near_dups_against_corpus(batch, docs, idx).selectExpr(
                "count(*) AS n",
                "bit_xor(xxhash64(doc_a, doc_b)) AS fold",
            ).collect()[0]
            dt = time.perf_counter() - t0
            times[label].append(dt)
            folds[label].add((out["n"], out["fold"]))
            print(
                f"# rep{rep + 1} {label}: {dt:.3f}s n={out['n']}",
                flush=True,
            )
    for label in ("1x", "10x"):
        assert len(folds[label]) == 1, f"nondeterministic result: {label}"
    m1 = statistics.median(times["1x"])
    m10 = statistics.median(times["10x"])
    print(
        f"RESULT index_1x_median={m1:.3f}s index_10x_median={m10:.3f}s "
        f"ratio={m10 / m1:.2f} (10x index, {len(folds['1x'])} distinct "
        f"folds/side; pairs_1x={next(iter(folds['1x']))[0]} "
        f"pairs_10x={next(iter(folds['10x']))[0]})"
    )


if __name__ == "__main__":
    main()
