"""Semantics pins for pipeline_chunk_dedup (Dolma-style paragraph /
chunk dedup over fixed 8-word windows): first occurrence in
(doc_id, chunk_idx) order wins globally; losers drop from the
reassembled text; reassembly preserves chunk order."""

from __future__ import annotations

import pandas as pd

from ciws_server_spark.operators.pipeline import (
    _CHUNK_WORDS,
    pipeline_chunk_dedup,
)


def _mkdocs(tmp_path, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_first_occurrence_wins_and_reassembly(spark, tmp_path):
    assert _CHUNK_WORDS == 8
    dup = " ".join(f"w{i}" for i in range(8))  # one exact 8-word chunk
    uniq_a = " ".join(f"a{i}" for i in range(8))
    uniq_b = " ".join(f"b{i}" for i in range(8))
    # doc0: [dup, uniq_a]; doc1: [uniq_b, dup] — doc1's dup loses to
    # doc0's (doc order), even though doc1's is mid-document
    sf = _mkdocs(tmp_path, [f"{dup} {uniq_a}", f"{uniq_b} {dup}"])
    rows = {
        r["doc_id"]: r
        for r in pipeline_chunk_dedup(spark, sf).collect()
    }
    assert rows[0]["n_chunks"] == 2 and rows[0]["n_kept"] == 2
    assert rows[0]["dedup_text"] == f"{dup} {uniq_a}"
    assert rows[1]["n_chunks"] == 2 and rows[1]["n_kept"] == 1
    assert rows[1]["dedup_text"] == uniq_b  # dup chunk removed


def test_within_doc_duplicate_and_tail(spark, tmp_path):
    dup = " ".join(f"x{i}" for i in range(8))
    tail = "t0 t1 t2"  # 3-word ragged tail = its own short chunk
    sf = _mkdocs(tmp_path, [f"{dup} {dup} {tail}"])
    (row,) = pipeline_chunk_dedup(spark, sf).collect()
    # 8+8+3 words -> 3 chunks; the second dup loses to the first
    assert row["n_chunks"] == 3 and row["n_kept"] == 2
    assert row["dedup_text"] == f"{dup} {tail}"


def test_all_chunks_duplicate_gives_empty_text(spark, tmp_path):
    dup = " ".join(f"y{i}" for i in range(8))
    sf = _mkdocs(tmp_path, [dup, dup])
    rows = {
        r["doc_id"]: r
        for r in pipeline_chunk_dedup(spark, sf).collect()
    }
    assert rows[0]["n_kept"] == 1 and rows[0]["dedup_text"] == dup
    assert rows[1]["n_kept"] == 0 and rows[1]["dedup_text"] == ""


def _land(dirpath, fname, docs):
    import json as _json

    with open(dirpath / fname, "w") as f:
        for d in docs:
            f.write(_json.dumps(d) + "\n")


def test_streaming_equals_batch_in_arrival_order(spark, tmp_path):
    """Streaming chunk dedup over doc_id-ordered batches accumulates
    exactly the batch operator's output on the union corpus — the
    cross-batch duplicate is caught via the persisted chunk index."""
    import pandas as pd

    from ciws_server_spark.streaming.dedup import (
        CHUNK_STATS_TABLE,
        run_chunk_dedup_pass,
    )

    dup = " ".join(f"w{i}" for i in range(8))
    texts = [
        f"{dup} " + " ".join(f"a{i}" for i in range(8)),   # doc0: dup + uniq
        " ".join(f"b{i}" for i in range(8)),                # doc1
        " ".join(f"c{i}" for i in range(8)) + f" {dup}",    # doc2: dup again
        f"{dup} {dup}",                                     # doc3: twice
    ]
    landing = tmp_path / "landing"
    tables = tmp_path / "tables"
    ckpt = str(tmp_path / "ckpt")
    landing.mkdir(), tables.mkdir()

    batches = [[0], [1, 2], [3]]
    for bi, ids in enumerate(batches):
        _land(
            landing, f"b{bi}.jsonl",
            [{"doc_id": i, "text": texts[i]} for i in ids],
        )
        run_chunk_dedup_pass(spark, str(landing), str(tables), ckpt)

    got = sorted(
        (
            (r["doc_id"], r["n_chunks"], r["n_kept"], r["dedup_text"])
            for r in spark.read.parquet(
                str(tables / CHUNK_STATS_TABLE)
            ).collect()
        )
    )

    # batch reference over the union corpus
    sf = tmp_path / "batchref"
    sf.mkdir()
    pd.DataFrame(
        {
            "doc_id": range(4),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(sf / "documents.parquet")
    want = sorted(
        (r["doc_id"], r["n_chunks"], r["n_kept"], r["dedup_text"])
        for r in pipeline_chunk_dedup(spark, str(sf)).collect()
    )
    assert got == want
    # the cross-batch duplicate was actually exercised: doc2 lost its
    # dup chunk to doc0 (different batches), doc3 lost both instances
    by_id = {g[0]: g for g in got}
    assert by_id[2][2] == 1 and dup not in by_id[2][3]
    assert by_id[3] == (3, 2, 0, "")  # 16 words = 2 chunks, both dups

    # replaying a completed pass with the same checkpoint is a no-op
    before = got
    run_chunk_dedup_pass(spark, str(landing), str(tables), ckpt)
    after = sorted(
        (r["doc_id"], r["n_chunks"], r["n_kept"], r["dedup_text"])
        for r in spark.read.parquet(
            str(tables / CHUNK_STATS_TABLE)
        ).collect()
    )
    assert after == before


def test_unigram_logprob_hand_computed(spark, tmp_path):
    """Corpus 'a a a b': p(a)=3/4, p(b)=1/4. doc0='a a' → 2·log2(4/3)
    / 2; doc1='a b' → (log2(4/3)+log2(4))/2."""
    import math

    from ciws_server_spark.operators.text_analysis import (
        text_unigram_logprob,
    )

    sf = _mkdocs(tmp_path, ["a a", "a b"])
    rows = {
        r["doc_id"]: r for r in text_unigram_logprob(spark, sf).collect()
    }
    la = math.log2(4 / 3)
    assert rows[0]["n_words"] == 2
    assert rows[0]["bits_per_word"] == round(la, 6)
    assert rows[1]["bits_per_word"] == round((la + 2.0) / 2, 6)
