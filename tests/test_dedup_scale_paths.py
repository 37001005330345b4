"""Scale-path dedup operators must agree with their exact baselines."""

from __future__ import annotations


def _pairs(df):
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()}


def test_prefix_filter_equals_full_inverted_index(spark, sf_smoke):
    """Prefix filtering is lossless at the configured threshold."""
    from ciws_server_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_ngram_prefix,
    )

    full = _pairs(dedup_ngram_jaccard(spark, sf_smoke))
    pref = _pairs(dedup_ngram_prefix(spark, sf_smoke))
    assert pref == full


def test_minhash_candidates_subset_of_exact(spark, sf_smoke):
    """Every LSH-verified pair is a true near-dup pair (no false
    positives can survive exact verification)."""
    from ciws_server_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    full = _pairs(dedup_ngram_jaccard(spark, sf_smoke))
    lsh = _pairs(dedup_minhash_lsh(spark, sf_smoke))
    assert lsh <= full


def test_min_label_propagation_chain_and_nonconvergence(spark):
    """Min-label propagation converges on a chain graph (single
    cluster, label = min node) and RAISES — never returns a partial
    over-split labeling — when the diameter exceeds the round bound."""
    import pytest

    from ciws_server_spark.operators.dedup import min_label_propagation

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "doc_a BIGINT, doc_b BIGINT"
    )
    labels = {
        r["node"]: r["label"]
        for r in min_label_propagation(chain, max_rounds=10).collect()
    }
    assert labels == {n: 1 for n in range(1, 9)}

    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_propagation(chain, max_rounds=2)
