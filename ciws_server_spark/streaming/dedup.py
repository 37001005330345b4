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

Each batch is ALSO self-deduped before the corpus join: the batch's
band signatures self-join on (band, band_hash) with ``doc_a > doc_b``
(the larger id is the duplicate, so the min-id arrival of a duplicate
group survives), and confirmed within-batch duplicates are excluded
from the kept/indexed set. Two near-identical docs landing in one
micro-batch therefore produce one survivor, the same outcome as if
they had arrived a batch apart.
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
NEAR_DUP_SCHEMA = "doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE, batch_id BIGINT"
INDEX_TABLE = "lsh_index"


def read_near_dups(spark: SparkSession, table_dir: str) -> DataFrame:
    """The near_dups table, or an empty typed frame if no pass has
    confirmed a pair yet (zero-row dynamic overwrites write no part
    files, so a raw ``spark.read.parquet`` cannot infer the schema).
    """
    path = os.path.join(table_dir, NEAR_DUP_TABLE)
    if not _has_parquet(path):
        return spark.createDataFrame([], NEAR_DUP_SCHEMA)
    # batch_id is a directory-derived partition column, which Spark
    # infers as INT; cast so the schema matches the declared
    # NEAR_DUP_SCHEMA (and the empty-table branch) exactly
    return spark.read.parquet(path).withColumn(
        "batch_id", F.col("batch_id").cast("bigint")
    )


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


def within_batch_near_dups(
    batch_docs: DataFrame, threshold: float = _JACCARD_THRESHOLD
) -> DataFrame:
    """(doc_a=duplicate, doc_b=survivor, jaccard) near-dup pairs WITHIN
    one micro-batch.

    Band-signature self-join on (band, band_hash), keeping only
    ``doc_a > doc_b`` — each duplicate points at a smaller-id match,
    so the minimum-id arrival of a duplicate group never appears as
    ``doc_a`` and survives. Verification is exact Jaccard over
    candidates only; the whole stage is micro-batch-sized.
    """
    sig = band_signatures(batch_docs)
    a = sig.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
    b = sig.select(F.col("doc_id").alias("doc_b"), "band", "band_hash")
    candidates = (
        a.join(b, ["band", "band_hash"])
        .where(F.col("doc_a") > F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return verify_pairs_cross(batch_docs, batch_docs, candidates, threshold)


def _overwrite_by_batch(df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent per-batch write: dynamic partition overwrite of the
    batch's own ``batch_id=N`` partition — a replayed batch rewrites
    itself instead of appending (module-level so the chaos test can
    inject a kill between the pairs and index writes)."""
    (
        df.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def _has_parquet(path: str) -> bool:
    """True if any parquet part file exists under ``path`` (local FS,
    like the rest of the sink file-management; an all-duplicate batch
    writes zero part files, so a bare directory probe is not enough).
    """
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def stream_near_dups(
    spark: SparkSession,
    landing_dir: str,
    corpus_docs: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    corpus_index: DataFrame | None = None,
    threshold: float = _JACCARD_THRESHOLD,
    grow_index: bool = False,
) -> StreamingQuery:
    """Start an availableNow near-dup detection pass.

    Returns the started query; ``awaitTermination()`` runs the pass to
    completion. Confirmed pairs land in ``<table_dir>/near_dups``
    partitioned by batch_id (idempotent under replay).

    With ``grow_index`` the pass is a self-maintaining dedup service:
    each batch's KEPT docs (no confirmed duplicate) have their band
    signatures appended to ``<table_dir>/lsh_index`` — also
    overwrite-by-batch — and later batches join against corpus ∪
    previously-kept newcomers, so a duplicate arriving an hour after
    its original is still caught.
    """
    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("pathGlobFilter", "*.json*")
        .json(landing_dir)
    )
    out_path = os.path.join(table_dir, NEAR_DUP_TABLE)
    index_path = os.path.join(table_dir, INDEX_TABLE)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # a multi-consumer micro-batch frame: signatures + verify both
        # read it, and streaming sources can't be re-scanned mid-batch
        batch_df = batch_df.localCheckpoint(eager=True)
        corpus = corpus_docs.select("doc_id", "text")
        idx = corpus_index
        if grow_index and _has_parquet(index_path):
            # prior batches' kept docs join the static side, so later
            # batches dedup against earlier arrivals too — reading the
            # index back each batch keeps this crash-consistent (a
            # replayed batch sees exactly the pre-crash index; its own
            # partition is overwritten, never double-appended)
            # exclude THIS batch's own partition: a replayed batch
            # must not join against its pre-crash self (every doc
            # would match itself, flipping the whole batch to
            # "duplicate" and overwriting its kept-set with empty)
            grown = spark.read.parquet(index_path).where(
                F.col("batch_id") != int(batch_id)
            )
            base_idx = (
                idx if idx is not None else band_signatures(corpus_docs)
            )
            idx = base_idx.unionByName(
                grown.select("doc_id", "band", "band_hash")
            )
            corpus = corpus.unionByName(
                grown.select("doc_id", "text").distinct()
            )
        # within-batch self-dedup first: two near-dups landing in ONE
        # batch yield one survivor (min doc_id), exactly as if they
        # had arrived a batch apart
        pairs = within_batch_near_dups(batch_df, threshold).unionByName(
            near_dups_against_corpus(batch_df, corpus, idx, threshold)
        )
        pairs = pairs.localCheckpoint(eager=True)
        _overwrite_by_batch(pairs, out_path, batch_id)
        if grow_index:
            # keep = newcomers with NO confirmed duplicate; store text
            # alongside signatures so future verification can re-derive
            # shingles (at scale this is the doc store reference, not
            # an inline copy)
            dup_ids = pairs.select(F.col("doc_a").alias("doc_id")).distinct()
            kept = batch_df.join(dup_ids, "doc_id", "left_anti")
            new_rows = band_signatures(kept).join(
                kept.select("doc_id", "text"), "doc_id"
            )
            _overwrite_by_batch(new_rows, index_path, batch_id)

    return (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


CHUNK_INDEX_TABLE = "chunk_index"
CHUNK_STATS_TABLE = "chunk_dedup_stats"


def stream_chunk_dedup(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Incremental chunk-exact dedup against a growing corpus index —
    the streaming plane of ``operators.pipeline.pipeline_chunk_dedup``.

    Each micro-batch chunks its documents with the SAME expressions as
    the batch operator (``pipeline.chunk_instances``), resolves
    within-batch first occurrence (row_number over the chunk text,
    (doc_id, chunk_idx) order), marks instances whose chunk already
    exists in ``<table_dir>/chunk_index`` as duplicates, appends the
    per-document stats rows to ``<table_dir>/chunk_dedup_stats`` and
    the batch's NEW surviving chunks to the index — both
    overwrite-by-batch, so a replayed batch rewrites itself (the
    replay reads the pre-crash index minus its own partition, exactly
    like the LSH index above).

    Semantics: FIRST ARRIVAL wins across batches (within a batch,
    smallest (doc_id, chunk_idx)). When documents arrive in doc_id
    order, the accumulated stats table equals the batch operator's
    output over the union — pinned by the equivalence test.

    Scale shape per batch: one shuffle of the batch's chunks (tiny),
    one left join against the index on the chunk text — at 100 TB the
    index is the big side, so this is a shuffle join pruned by the
    batch's chunk keys; partitioning the index table by a chunk-hash
    bucket would make it a bucket-local join, same as the banded LSH
    index."""
    from ..operators.pipeline import chunk_dedup_stats, chunk_instances

    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("pathGlobFilter", "*.json*")
        .json(landing_dir)
    )
    stats_path = os.path.join(table_dir, CHUNK_STATS_TABLE)
    index_path = os.path.join(table_dir, CHUNK_INDEX_TABLE)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window as W

        batch_df = batch_df.localCheckpoint(eager=True)
        ex = chunk_instances(batch_df)
        rn = F.row_number().over(
            W.partitionBy("chunk").orderBy("doc_id", "ci")
        )
        ranked = ex.withColumn("_first", rn == F.lit(1))
        if _has_parquet(index_path):
            seen = (
                spark.read.parquet(index_path)
                .where(F.col("batch_id") != int(batch_id))
                .select("chunk")
                .distinct()
                .withColumn("_seen", F.lit(True))
            )
            ranked = ranked.join(seen, "chunk", "left")
            keep = F.col("_first") & F.col("_seen").isNull()
        else:
            keep = F.col("_first")
        flagged = ranked.withColumn("keep", keep).localCheckpoint(
            eager=True
        )
        _overwrite_by_batch(chunk_dedup_stats(flagged), stats_path, batch_id)
        _overwrite_by_batch(
            flagged.where(F.col("keep")).select("chunk").distinct(),
            index_path,
            batch_id,
        )

    return (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_chunk_dedup_pass(
    spark: SparkSession,
    landing_dir: str,
    table_dir: str,
    checkpoint_dir: str,
) -> None:
    """One complete pass: process everything landed, then stop."""
    stream_chunk_dedup(
        spark, landing_dir, table_dir, checkpoint_dir
    ).awaitTermination()


def run_near_dup_pass(
    spark: SparkSession,
    landing_dir: str,
    corpus_docs: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    corpus_index: DataFrame | None = None,
    threshold: float = _JACCARD_THRESHOLD,
    grow_index: bool = False,
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
        grow_index,
    )
    q.awaitTermination()
