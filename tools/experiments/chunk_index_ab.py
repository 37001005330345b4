"""Streaming chunk-dedup index-growth A/B (r11).

Question: does per-batch latency of stream_chunk_dedup degrade as the
persisted chunk index grows? Method mirrors streaming_index_ab.py
(the LSH-index growth A/B): seed one store with a 1× corpus index and
another with a 10× corpus index, then run THE SAME probe batches
through both and compare per-batch wall. The probe batches contain
chunks duplicated from the shared 1× subset, so both sides do
identical verify work — only the index size differs.

Writes tmp/CHUNK_INDEX_AB.json.
Usage: python tools/experiments/chunk_index_ab.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from ciws_server_spark.session import get_spark  # noqa: E402
from ciws_server_spark.streaming.dedup import (  # noqa: E402
    run_chunk_dedup_pass,
)

SF_SMALL = "/root/testdata/sf0.01"  # 500 docs -> 1x index
SF_BIG = "/root/testdata/sf0.1"  # 5000 docs -> 10x index (superset vocab)
N_PROBE_BATCHES = 3
PROBE_DOCS = 50


def _land(spark, landing: str, rows, fname: str) -> None:
    with open(os.path.join(landing, fname), "w") as fh:
        for doc_id, text in rows:
            fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _setup(spark, sf_dir: str, root: str) -> tuple[str, str, str]:
    landing = os.path.join(root, "landing")
    tables = os.path.join(root, "tables")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(landing), os.makedirs(tables)
    corpus = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).collect()
    ]
    _land(spark, landing, corpus, "corpus.jsonl")
    t0 = time.monotonic()
    run_chunk_dedup_pass(spark, landing, tables, ckpt)
    build_s = time.monotonic() - t0
    print(f"# index built from {sf_dir}: {len(corpus)} docs, {build_s:.2f}s")
    return landing, tables, ckpt


def main() -> None:
    spark = get_spark("chunk-index-ab")
    # probe batches: docs re-using the SMALL corpus's text (so both
    # sides hit index matches), with fresh ids
    small_docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(
            os.path.join(SF_SMALL, "documents.parquet")
        ).limit(PROBE_DOCS * N_PROBE_BATCHES).collect()
    ]
    sides: dict[str, dict] = {}
    for name, sf in (("1x", SF_SMALL), ("10x", SF_BIG)):
        root = tempfile.mkdtemp(prefix=f"chunkab_{name}_")
        landing, tables, ckpt = _setup(spark, sf, root)
        walls = []
        for b in range(N_PROBE_BATCHES):
            batch = [
                (1_000_000 + b * PROBE_DOCS + i, text)
                for i, (_, text) in enumerate(
                    small_docs[b * PROBE_DOCS : (b + 1) * PROBE_DOCS]
                )
            ]
            _land(spark, landing, batch, f"probe{b}.jsonl")
            t0 = time.monotonic()
            run_chunk_dedup_pass(spark, landing, tables, ckpt)
            walls.append(round(time.monotonic() - t0, 3))
        sides[name] = {"per_batch_s": walls, "median_s": statistics.median(walls)}
        print(f"# {name}: per-batch {walls} median {sides[name]['median_s']}")
        shutil.rmtree(root, ignore_errors=True)
    out = {
        "probe_docs_per_batch": PROBE_DOCS,
        "batches": N_PROBE_BATCHES,
        "sides": sides,
        "ratio_10x_over_1x": round(
            sides["10x"]["median_s"] / sides["1x"]["median_s"], 3
        ),
    }
    os.makedirs("/root/repo/tmp", exist_ok=True)
    with open("/root/repo/tmp/CHUNK_INDEX_AB.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
