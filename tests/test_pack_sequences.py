"""Sequence packing: the two-level distributed prefix sum must agree
with a plain sequential cumsum at EVERY block boundary.

The sf0.001 fixture has few documents, so with production block widths
(4096 docs/block) everything lands in one block and the block/
superblock roll-up logic would go untested. These tests shrink the
widths to force many blocks per superblock and many superblocks, then
compare against pandas' sequential cumsum — the same invariant the
DuckDB oracle checks at the default widths in test_extra_oracle.
"""

from __future__ import annotations

import pytest

from ciws_server_spark.operators import pipeline


@pytest.mark.parametrize("block,super_", [(4, 3), (1, 1), (7, 2)])
def test_prefix_sum_across_block_boundaries(
    spark, sf_smoke, monkeypatch, block, super_
):
    monkeypatch.setattr(pipeline, "_PACK_BLOCK", block)
    monkeypatch.setattr(pipeline, "_PACK_SUPER", super_)
    got = (
        pipeline.pipeline_pack_sequences(spark, sf_smoke)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expected = got["n_tokens"].cumsum().shift(1).fillna(0).astype("int64")
    assert (got["cum_before"] == expected).all()
    assert (got["chunk_start"] == got["cum_before"] // 2048).all()
    assert (got["n_chunks"] >= 1).all()


def test_chunks_tile_the_token_stream(spark, sf_smoke):
    """Consecutive non-empty documents must hand off contiguously:
    doc N+1's first token chunk is doc N's last chunk or the next one
    (never a gap, never an overlap going backwards)."""
    got = (
        pipeline.pipeline_pack_sequences(spark, sf_smoke)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    nonempty = got[got["n_tokens"] > 0].reset_index(drop=True)
    prev_end = nonempty["chunk_end"].shift(1)
    start = nonempty["chunk_start"]
    ok = prev_end.isna() | (start - prev_end).isin([0, 1])
    assert ok.all()
    # total chunks consumed = ceil(total tokens / budget)
    total = int(got["n_tokens"].sum())
    assert int(nonempty["chunk_end"].max()) == (total - 1) // 2048
