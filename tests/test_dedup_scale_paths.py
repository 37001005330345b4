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
