"""Streaming near-duplicate detection: micro-batches vs a static
corpus LSH index (the online half of the dedup suite).

A training-data pipeline doesn't just dedup a frozen corpus once — new
documents keep arriving and must be checked against what's already
ingested. This module runs that continuously: JSON-lines document
files land in a directory, Structured Streaming's file source
discovers them (checkpointed — each file enters exactly one batch),
and every micro-batch

1. computes MinHash band signatures with the SAME codegen'd
   expressions as the batch operator (operators/dedup.band_signatures
   — one md5 per shingle, K partial-min aggregates, ``bands`` rows
   per doc);
2. joins them against the static corpus index on (band, band_hash) —
   the stream side is micro-batch-sized and broadcast, so per-batch
   cost is O(batch × bucket collisions), independent of corpus row
   count;
3. verifies candidates with exact Jaccard
   (operators/dedup.verify_pairs_cross) — candidates only, one
   shuffle;
4. appends confirmed pairs to the ``near_dups`` parquet table with
   the same idempotent overwrite-by-batch protocol as streaming
   ingest (sources/sinks.py): replay after a crash rewrites the same
   ``batch_id=N`` partition instead of duplicating rows.

The signature pipeline contains a per-doc aggregate, which as a pure
streaming plan would be a stateful aggregation (watermark + update
mode) for no benefit — each doc's signature depends only on its own
row. foreachBatch gives plain batch semantics per trigger, exactly
like streaming ingest, and lets the LSH join + verify run as ordinary
Catalyst plans.

At 100 TB the corpus index is a parquet table partitioned by band (4
small rows per doc); loading it per pass is a scan of doc_count × 4
short rows, and the (band, band_hash) join prunes to colliding
buckets. New confirmed pairs can feed dedup_clusters incrementally.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    _JACCARD_THRESHOLD,
    band_signatures,
    verify_pairs_cross,
)

#: Landing-file schema: one JSON object per line.
DOC_SCHEMA = "doc_id BIGINT, text STRING"

NEAR_DUP_TABLE = "near_dups"


def near_dups_against_corpus(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    corpus_index: DataFrame | None = None,
    threshold: float = _JACCARD_THRESHOLD,
) -> DataFrame:
    """(doc_a=new, doc_b=corpus, jaccard) near-dup pairs of a batch of
    new documents against the corpus.

    ``corpus_index`` is the precomputed ``band_signatures`` frame (the
    persisted LSH index table); pass None to derive it on the fly
    (small corpora / tests). Batch-semantics core shared by the
    streaming pass and direct calls.
    """
    sig_new = band_signatures(new_docs).select(
        F.col("doc_id").alias("doc_a"), "band", "band_hash"
    )
    idx = corpus_index if corpus_index is not None else band_signatures(corpus_docs)
    candidates = (
        F.broadcast(sig_new)
        .join(
            idx.select(F.col("doc_id").alias("doc_b"), "band", "band_hash"),
            ["band", "band_hash"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return verify_pairs_cross(new_docs, corpus_docs, candidates, threshold)


def stream_near_dups(
    spark: SparkSession,
    landing_dir: str,
    corpus_docs: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    corpus_index: DataFrame | None = None,
    threshold: float = _JACCARD_THRESHOLD,
) -> StreamingQuery:
    """Start an availableNow near-dup detection pass.

    Returns the started query; ``awaitTermination()`` runs the pass to
    completion. Confirmed pairs land in ``<table_dir>/near_dups``
    partitioned by batch_id (idempotent under replay).
    """
    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("pathGlobFilter", "*.json*")
        .json(landing_dir)
    )
    out_path = os.path.join(table_dir, NEAR_DUP_TABLE)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        pairs = near_dups_against_corpus(
            batch_df, corpus_docs, corpus_index, threshold
        )
        (
            pairs.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_near_dup_pass(
    spark: SparkSession,
    landing_dir: str,
    corpus_docs: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    corpus_index: DataFrame | None = None,
    threshold: float = _JACCARD_THRESHOLD,
) -> None:
    """One complete pass: process everything landed, then stop."""
    q = stream_near_dups(
        spark,
        landing_dir,
        corpus_docs,
        table_dir,
        checkpoint_dir,
        corpus_index,
        threshold,
    )
    q.awaitTermination()
