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


def test_embedding_lsh_verify_branch_finds_constructed_neardups(spark):
    """The cosine-verify branch on constructed near-duplicate vectors:
    an exact duplicate and a slightly-perturbed copy must both survive
    LSH bucketing + exact-cosine verification at the 0.9 semantic
    threshold, while unrelated random vectors must not."""
    import hashlib

    from ciws_server_spark.operators.dedup import embedding_lsh_pairs

    dim = 64

    def vec(seed: str) -> list[float]:
        return [
            int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:4], 16)
            / 65535.0
            - 0.5
            for d in range(dim)
        ]

    base = vec("base")
    exact_dup = list(base)
    # perturb one coordinate slightly: cosine stays > 0.99
    near_dup = list(base)
    near_dup[0] += 0.01
    rows = [
        (1, base),
        (2, exact_dup),
        (3, near_dup),
        *[(10 + i, vec(f"noise{i}")) for i in range(20)],
    ]
    emb = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    pairs = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in embedding_lsh_pairs(emb, 0.9).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.99
    assert (2, 3) in pairs
    # no unrelated pair sneaks past exact verification
    assert all(a in (1, 2, 3) and b in (1, 2, 3) for a, b in pairs)


def test_band_signature_strategies_bit_identical(spark):
    """band_signatures has two physical strategies (codegen'd
    explode/groupBy — the shipped default at every scale since r15 —
    and the zero-shuffle row-local array folds kept for experiments).
    Same md5-derived 31-bit x and (a_k·x + b_k) mod p family — the
    rows must be bit-identical, or a forced-strategy experiment
    silently measures a different query (exactly the r14 incident
    this pin caught)."""
    from ciws_server_spark.operators.dedup import band_signatures
    from ciws_server_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.01", "documents")
    a = sorted(
        map(tuple, band_signatures(docs, strategy="explode").collect())
    )
    b = sorted(
        map(tuple, band_signatures(docs, strategy="rowlocal").collect())
    )
    assert a and a == b
