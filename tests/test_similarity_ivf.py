"""Trained-IVF search path (similarity.sim_ivf_trained_topk).

Checks the pieces the oracle comparison can't articulate on its own:
probe lists are ranked (own cell first, no duplicates) and the
nprobe=2 search actually returns neighbors from OUTSIDE the query's
own cell — the recall evidence that motivates multi-probe over the
nprobe=1 baseline (``sim_ivf_topk``).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_trained_topk_probe_order_and_cross_cell_recall(spark, sf_smoke):
    from ciws_server_spark.operators import similarity as S

    cents = S.kmeans_train(spark, sf_smoke)
    q = (
        S.table(spark, sf_smoke, "embeddings")
        .where(F.col("vec_id") < S._N_QUERIES)
        .select(
            "vec_id",
            S._cell_for_centroids(F.col("embedding"), cents).alias("own_cell"),
            S._probe_cells_col(F.col("embedding"), cents).alias("probes"),
        )
        .collect()
    )
    assert len(q) == S._N_QUERIES
    for r in q:
        assert len(r["probes"]) == S._NPROBE
        assert len(set(r["probes"])) == S._NPROBE
        # nearest probe is the cell the vector itself is assigned to
        assert r["probes"][0] == r["own_cell"]

    out = S.sim_ivf_trained_topk(spark, sf_smoke).collect()
    per_query: dict[int, int] = {}
    for r in out:
        per_query[r["query_id"]] = per_query.get(r["query_id"], 0) + 1
    assert set(per_query) == set(range(S._N_QUERIES))
    assert all(n == S._IVF_TOP_K for n in per_query.values())

    own_cell = {r["vec_id"]: r["own_cell"] for r in q}
    # the whole point of nprobe>1: at least one returned neighbor
    # comes from the second-nearest cell, not the query's own
    assert any(r["cell"] != own_cell[r["query_id"]] for r in out)


def test_saved_ivf_index_roundtrip_and_pruning(spark, sf_smoke, tmp_path):
    """Persisted IVF: save (train + cell-partitioned corpus) → load →
    serve. Results match the in-session trained search, and the serve
    scan reads ONLY the probed cell partitions (partition pruning on
    the cell key — the 100 TB serving mechanism)."""
    from pyspark.sql import functions as F

    import ciws_server_spark.operators.similarity as S

    model = str(tmp_path / "ivf_model")
    S.save_ivf_index(spark, sf_smoke, model)

    # centroids round-trip exactly (they're plain doubles in parquet)
    cents_mem = S.kmeans_train(spark, sf_smoke)
    cents_disk = S.load_ivf_centroids(spark, model)
    assert cents_disk == cents_mem

    emb = S.table(spark, sf_smoke, "embeddings")
    queries = emb.where(F.col("vec_id") < S._N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    served = S.ivf_search_saved(spark, model, queries).collect()
    trained = S.sim_ivf_trained_topk(spark, sf_smoke).collect()
    key = lambda r: (r["query_id"], r["rk"])  # noqa: E731
    assert sorted(
        [(r["query_id"], r["neighbor_id"], r["cos"], r["rk"]) for r in served]
    ) == sorted(
        [(r["query_id"], r["neighbor_id"], r["cos"], r["rk"]) for r in trained]
    )

    # pruning evidence: files actually read by one query's serve plan
    # are a strict subset — only its nprobe probed cells
    one = queries.where(F.col("query_id") == 0)
    probed = S.ivf_search_saved(spark, model, one)
    corpus = spark.read.parquet(f"{model}/corpus_by_cell")
    n_total = corpus.select(F.input_file_name()).distinct().count()
    probe_cells = [
        r["qcell"]
        for r in one.select(
            S._probe_cells_col(
                F.col("embedding"), S.load_ivf_centroids(spark, model)
            ).alias("pc")
        )
        .select(F.explode("pc").alias("qcell"))
        .collect()
    ]
    plan_files = (
        corpus.withColumn("f", F.input_file_name())
        .where(F.col("cell").isin(probe_cells))
        .select("f")
        .distinct()
        .count()
    )
    assert plan_files < n_total
    cells_read = {r["cell"] for r in probed.select("cell").distinct().collect()}
    assert len(cells_read) <= S._NPROBE
