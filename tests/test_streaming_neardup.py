"""Streaming near-dup detection: stream-vs-static-corpus LSH join,
cross-batch discovery, and idempotent replay (streaming/dedup.py)."""

from __future__ import annotations

import json

import pytest

from ciws_server_spark.streaming.dedup import (
    NEAR_DUP_TABLE,
    near_dups_against_corpus,
    run_near_dup_pass,
)
from ciws_server_spark.operators.dedup import band_signatures
from ciws_server_spark.tables import table


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    return table(spark, sf_smoke, "documents").select("doc_id", "text")


def _corpus_text(corpus, doc_id: int) -> str:
    return corpus.where(f"doc_id = {doc_id}").collect()[0]["text"]


def _land(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_batch_core_detects_exact_and_near(spark, corpus):
    base = _corpus_text(corpus, 0)
    new = spark.createDataFrame(
        [
            (10_000, base),                      # exact dup of doc 0
            (10_001, base + " trailing extra"),  # near dup of doc 0
            (10_002, "completely unrelated words nowhere in corpus"),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in near_dups_against_corpus(new, corpus).collect()
    }
    assert got[(10_000, 0)] == 1.0
    assert (10_001, 0) in got and got[(10_001, 0)] >= 0.5
    assert not any(a == 10_002 for a, _ in got)


def test_streaming_pass_cross_batch_and_replay(spark, corpus, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    tables = str(tmp_path / "tables")
    ckpt = str(tmp_path / "ckpt")
    # precomputed static index, as a deployment would persist it
    idx = band_signatures(corpus).cache()
    idx.count()

    base0 = _corpus_text(corpus, 0)
    base1 = _corpus_text(corpus, 1)

    # batch 1: one exact dup + one unrelated doc
    _land(landing / "b1.jsonl", [
        {"doc_id": 20_000, "text": base0},
        {"doc_id": 20_001, "text": "nothing like the corpus at all"},
    ])
    run_near_dup_pass(spark, str(landing), corpus, tables, ckpt, idx)
    out = spark.read.parquet(f"{tables}/{NEAR_DUP_TABLE}")
    first = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (20_000, 0) in first
    assert not any(a == 20_001 for a, _ in first)

    # batch 2 (new file, same checkpoint): near dup of a different doc
    _land(landing / "b2.jsonl", [
        {"doc_id": 20_002, "text": base1 + " tail"},
    ])
    run_near_dup_pass(spark, str(landing), corpus, tables, ckpt, idx)
    out = spark.read.parquet(f"{tables}/{NEAR_DUP_TABLE}")
    pairs = [(r["doc_a"], r["doc_b"]) for r in out.collect()]
    assert (20_002, 1) in pairs
    # batch-1 results intact, nothing double-ingested
    assert (20_000, 0) in pairs
    assert len(pairs) == len(set(pairs))

    # replay: same checkpoint, no new files → no growth
    n_before = out.count()
    run_near_dup_pass(spark, str(landing), corpus, tables, ckpt, idx)
    assert spark.read.parquet(f"{tables}/{NEAR_DUP_TABLE}").count() == n_before
    idx.unpersist()


def test_grow_index_catches_later_arriving_dup(spark, corpus, tmp_path):
    """Self-maintaining mode: a newcomer kept in pass 1 becomes part
    of the static side, so its near-dup arriving in pass 2 is caught
    even though neither resembles the original corpus."""
    from ciws_server_spark.streaming.dedup import INDEX_TABLE, read_near_dups

    landing = tmp_path / "landing"
    landing.mkdir()
    tables = str(tmp_path / "tables")
    ckpt = str(tmp_path / "ckpt")

    # 40 distinct invented tokens: nothing like the corpus, and enough
    # distinct shingles that an exact copy always lands in its buckets
    novel = " ".join(f"zyx{i}qq" for i in range(40))

    _land(landing / "b1.jsonl", [{"doc_id": 30_000, "text": novel.strip()}])
    run_near_dup_pass(
        spark, str(landing), corpus, tables, ckpt, grow_index=True
    )
    idx = spark.read.parquet(f"{tables}/{INDEX_TABLE}")
    assert idx.where("doc_id = 30000").count() > 0  # kept + indexed
    assert read_near_dups(spark, tables).count() == 0

    # an exact copy of the pass-1 newcomer (J=1.0: every band matches,
    # so detection is deterministic, unlike a probabilistic near-copy)
    _land(
        landing / "b2.jsonl",
        [{"doc_id": 30_001, "text": novel.strip()}],
    )
    run_near_dup_pass(
        spark, str(landing), corpus, tables, ckpt, grow_index=True
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in read_near_dups(spark, tables).collect()
    }
    assert (30_001, 30_000) in pairs
    # the duplicate was NOT added to the index
    idx = spark.read.parquet(f"{tables}/{INDEX_TABLE}")
    assert idx.where("doc_id = 30001").count() == 0


def test_within_batch_self_dedup(spark, corpus, tmp_path):
    """Two near-dups landing in the SAME micro-batch: only the min
    doc_id survivor is kept/indexed; the pair is recorded with the
    larger id as doc_a (r3 ask #3)."""
    from ciws_server_spark.streaming.dedup import INDEX_TABLE, read_near_dups

    landing = tmp_path / "landing"
    landing.mkdir()
    tables = str(tmp_path / "tables")
    ckpt = str(tmp_path / "ckpt")

    novel = " ".join(f"wvu{i}kk" for i in range(40))
    # one batch: exact copies (J=1.0 → deterministic detection) plus
    # one unrelated doc
    _land(landing / "b1.jsonl", [
        {"doc_id": 40_000, "text": novel},
        {"doc_id": 40_001, "text": novel},
        {"doc_id": 40_002, "text": "entirely different text here"},
    ])
    run_near_dup_pass(
        spark, str(landing), corpus, tables, ckpt, grow_index=True
    )
    nd = read_near_dups(spark, tables)
    pairs = {(r["doc_a"], r["doc_b"]) for r in nd.collect()}
    assert (40_001, 40_000) in pairs  # larger id is the duplicate
    assert not any(a == 40_000 for a, _ in pairs)  # survivor clean

    idx = spark.read.parquet(f"{tables}/{INDEX_TABLE}")
    assert idx.where("doc_id = 40000").count() > 0  # survivor indexed
    assert idx.where("doc_id = 40001").count() == 0  # duplicate not
    assert idx.where("doc_id = 40002").count() > 0  # unrelated kept

    # schema contract: empty and non-empty reads agree (batch_id is a
    # partition dir column — must come back BIGINT, not INT)
    assert dict(nd.dtypes)["batch_id"] == "bigint"
    assert nd.schema == read_near_dups(spark, str(tmp_path / "nope")).schema
