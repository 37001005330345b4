"""Domain-mixture materialization (operators/pipeline.domain_mixture):
epoch semantics, determinism, and budget proportionality."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ciws_server_spark.operators.pipeline import domain_mixture


@pytest.fixture(scope="module")
def docs(spark):
    # two sources, equal sizes: "big" weight 3 vs "small" weight 1 →
    # with budget = corpus size, epochs are exactly 1.5 and 0.5
    rows = [(i, "hi" if i % 2 == 0 else "lo", "x" * 100, 100)
            for i in range(400)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    )


def _wt():
    return F.when(F.col("source") == "hi", F.lit(3.0)).otherwise(F.lit(1.0))


def test_epoch_semantics(spark, docs):
    out = domain_mixture(docs, _wt()).cache()
    per_doc = (
        out.groupBy("doc_id", "source")
        .agg(F.max("copy").alias("n"))
        .collect()
    )
    hi = [r for r in per_doc if r["source"] == "hi"]
    lo = [r for r in per_doc if r["source"] == "lo"]
    # epochs(hi) = 1.5: every hi doc appears once or twice, never 0
    assert len(hi) == 200
    assert set(r["n"] for r in hi) == {1, 2}
    # the Bernoulli(0.5) extra copy lands on roughly half (md5-uniform)
    two = sum(1 for r in hi if r["n"] == 2)
    assert 60 <= two <= 140
    # epochs(lo) = 0.5: subsample — docs appear at most once
    assert all(r["n"] == 1 for r in lo)
    assert 60 <= len(lo) <= 140
    # copy column is a dense 1..n per doc
    dense = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("c"), F.max("copy").alias("m"))
        .where(F.col("c") != F.col("m"))
        .count()
    )
    assert dense == 0


def test_deterministic_rerun(spark, docs):
    a = sorted(
        (r["doc_id"], r["copy"])
        for r in domain_mixture(docs, _wt()).collect()
    )
    b = sorted(
        (r["doc_id"], r["copy"])
        for r in domain_mixture(docs, _wt()).collect()
    )
    assert a == b


def test_budget_scales_epochs(spark, docs):
    # half the budget → half the epochs: hi 0.75 (≤1 copy), lo 0.25
    total = 400 * 100
    out = domain_mixture(docs, _wt(), budget_chars=total / 2)
    per_source = {
        r["source"]: r["n"]
        for r in out.groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # expected ~150 hi (0.75 × 200) and ~50 lo (0.25 × 200)
    assert 110 <= per_source["hi"] <= 190
    assert 20 <= per_source.get("lo", 0) <= 80
    assert out.agg(F.max("copy")).first()[0] == 1


def test_uniform_weight_default_budget_is_identity_epoch(spark, docs):
    # equal weights + default budget → epochs exactly 1.0 everywhere:
    # every doc exactly once (frac = 0, no Bernoulli draw fires)
    out = domain_mixture(docs, F.lit(1.0))
    assert out.count() == 400
    assert out.agg(F.max("copy")).first()[0] == 1


def test_global_order_layout_independent(spark, docs):
    """position is the global rank of unique keys — identical across
    partition layouts (the reproducibility contract)."""
    from pyspark.sql import functions as F

    from ciws_server_spark.operators.pipeline import global_order

    key = F.md5(F.col("doc_id").cast("string"))
    a = global_order(
        docs.select("doc_id", key.alias("k")), ["k", "doc_id"]
    )
    b = global_order(
        docs.repartition(13).select("doc_id", key.alias("k")),
        ["k", "doc_id"],
    )
    pa = {r["doc_id"]: r["position"] for r in a.collect()}
    pb = {r["doc_id"]: r["position"] for r in b.collect()}
    assert pa == pb
    assert sorted(pa.values()) == list(range(1, 401))
