"""Sharded training-data export job: deterministic shard assignment,
write-audit-publish manifest, idempotent re-run (jobs.py)."""

from __future__ import annotations

import os

from ciws_server_spark.jobs import export_training_shards
from ciws_server_spark.operators.pipeline import pipeline_curated_corpus


def test_export_training_shards(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "export")
    manifest = export_training_shards(spark, sf_smoke, out, n_shards=4)

    rows = {r["shard"]: r for r in manifest.collect()}
    assert set(rows) <= {0, 1, 2, 3} and rows

    curated = pipeline_curated_corpus(spark, sf_smoke)
    n_curated = curated.count()
    assert sum(r["n_docs"] for r in rows.values()) == n_curated

    # manifest attests the written files
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.count() == n_curated
    assert {"doc_id", "text", "n_tokens", "shard"} <= set(corpus.columns)
    shard_dirs = {
        d for d in os.listdir(f"{out}/corpus") if d.startswith("shard=")
    }
    assert shard_dirs == {f"shard={s}" for s in rows}

    # re-run: same assignment per doc, no duplication (idempotent)
    before = {
        r["doc_id"]: r["shard"] for r in corpus.select("doc_id", "shard").collect()
    }
    export_training_shards(spark, sf_smoke, out, n_shards=4)
    corpus2 = spark.read.parquet(f"{out}/corpus")
    after = {
        r["doc_id"]: r["shard"]
        for r in corpus2.select("doc_id", "shard").collect()
    }
    assert after == before
