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
