"""Product quantization (operators/similarity.py PQ section):
training determinism (bit-identity across reruns), encode/ADC
correctness vs an independent numpy replay, and recall against exact
L2 — the pin set that stands in for a SQL oracle (the result is
algorithm-specific quantized distances, same class as the HLL
sketches)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from ciws_server_spark.operators.similarity import (
    _DIM,
    _PQ_K,
    _PQ_M,
    _PQ_SUB,
    pq_encode,
    pq_seed_codebooks,
    pq_topk,
    pq_train,
    sim_pq_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    from ciws_server_spark.tables import table

    rows = table(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    )
    pdf = rows.toPandas().sort_values("vec_id")
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    return rows, pdf["vec_id"].to_numpy(), mat


def _numpy_train(mat, rounds=2):
    """Independent replay of pq_train's exact fixed-point update."""
    scale = float(2**40)
    cbs = [np.array(cb) for cb in pq_seed_codebooks()]
    for _ in range(rounds):
        nxt = []
        for j, cmat in enumerate(cbs):
            sv = mat[:, j * _PQ_SUB:(j + 1) * _PQ_SUB]
            acc = np.zeros((sv.shape[0], cmat.shape[0]))
            for d in range(sv.shape[1]):
                diff = sv[:, [d]] - cmat[:, d]
                acc += diff * diff
            codes = np.argmin(acc, axis=1)
            scaled = np.floor(sv * scale).astype(np.int64)
            out = cmat.copy()
            for c in range(_PQ_K):
                sel = scaled[codes == c]
                if len(sel):
                    out[c] = (
                        sel.sum(axis=0, dtype=np.int64).astype(np.float64)
                        * (2.0**-40)
                    ) / float(len(sel))
            nxt.append(out)
        cbs = nxt
    return cbs


def test_train_bit_identical_to_numpy_replay(spark, corpus):
    _rows, _ids, mat = corpus
    got = pq_train(spark, SF)
    want = _numpy_train(mat)
    assert len(got) == _PQ_M
    for j in range(_PQ_M):
        g = np.array(got[j])
        assert g.shape == (_PQ_K, _PQ_SUB)
        assert np.array_equal(g, want[j]), f"subspace {j}"


def test_encode_matches_numpy_argmin(spark, corpus):
    rows, ids, mat = corpus
    cbs = pq_train(spark, SF)
    enc = (
        pq_encode(rows, cbs)
        .select("vec_id", "pq_codes")
        .toPandas()
        .sort_values("vec_id")
    )
    got = np.vstack(enc["pq_codes"].to_numpy())
    for j, cb in enumerate(cbs):
        cmat = np.array(cb)
        sv = mat[:, j * _PQ_SUB:(j + 1) * _PQ_SUB]
        acc = np.zeros((sv.shape[0], cmat.shape[0]))
        for d in range(sv.shape[1]):
            diff = sv[:, [d]] - cmat[:, d]
            acc += diff * diff
        assert np.array_equal(got[:, j], np.argmin(acc, axis=1)), j


def test_topk_plan_and_adc_values(spark, corpus):
    rows, ids, mat = corpus
    cbs = pq_train(spark, SF)
    enc = pq_encode(rows, cbs).select("vec_id", "pq_codes")
    q = [float(x) for x in mat[0]]
    out = pq_topk(enc, q, cbs, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    got = out.collect()
    assert len(got) == 5
    # ADC distance replay: LUT lookup sum for the winner
    cbs_np = [np.array(cb) for cb in cbs]
    enc_pdf = enc.toPandas().set_index("vec_id")
    for r in got:
        codes = enc_pdf.loc[r["vec_id"], "pq_codes"]
        want = 0.0
        for j in range(_PQ_M):
            qj = np.array(q[j * _PQ_SUB:(j + 1) * _PQ_SUB])
            cent = cbs_np[j][codes[j]]
            s = 0.0
            for a, b in zip(qj, cent):
                s = s + (a - b) * (a - b)
            want += s
        assert r["adc_dist"] == pytest.approx(want, rel=1e-12)
    # winner includes the query itself (distance to own quantization
    # is minimal-ish); monotone non-decreasing distances
    dists = [r["adc_dist"] for r in got]
    assert dists == sorted(dists)


def test_refined_recall_vs_exact_l2(spark, corpus):
    """Two-stage search (ADC shortlist-100 → exact re-rank) must
    recover most of the exact-L2 top-10. Near-isotropic random
    embeddings are PQ's worst case — pure ADC top-10 measures ~0.2
    recall here (distance concentration), the production two-stage
    shape measures ~0.94 (shortlist containment); ≥0.7 is the pin."""
    from ciws_server_spark.operators.similarity import pq_topk_refined

    rows, ids, mat = corpus
    cbs = pq_train(spark, SF)
    enc = pq_encode(rows, cbs).select("vec_id", "pq_codes")
    recalls = []
    for qi in range(5):
        q = mat[qi]
        d2 = ((mat - q) ** 2).sum(axis=1)
        order = np.argsort(d2, kind="stable")
        exact = [int(ids[i]) for i in order if int(ids[i]) != qi][:10]
        got = [
            r["vec_id"]
            for r in pq_topk_refined(
                enc, rows, [float(x) for x in q], cbs, k=11
            ).collect()
            if r["vec_id"] != qi
        ][:10]
        recalls.append(len(set(exact) & set(got)) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.7, recalls
    # re-ranked distances are EXACT L2 — spot-check the winner
    q = [float(x) for x in mat[0]]
    top = pq_topk_refined(enc, rows, q, cbs, k=1).collect()[0]
    i = int(np.where(ids == top["vec_id"])[0][0])
    want = 0.0
    for a, b in zip(q, mat[i]):
        want = want + (a - b) * (a - b)
    assert top["l2_dist"] == pytest.approx(want, rel=1e-12)


def test_sim_pq_topk_shape_and_determinism(spark):
    a = sim_pq_topk(spark, SF)
    assert a.columns == ["query_id", "neighbor_id", "adc_dist", "rk"]
    rows_a = [tuple(r) for r in a.collect()]
    assert len(rows_a) == 50  # 10 queries × top-5
    rows_b = [tuple(r) for r in sim_pq_topk(spark, SF).collect()]
    assert rows_a == rows_b


def test_ivfpq_encode_matches_numpy(spark, corpus):
    from ciws_server_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_train,
    )

    rows, ids, mat = corpus
    cents, cbs = ivfpq_train(spark, SF)
    enc = (
        ivfpq_encode(rows, cents, cbs)
        .toPandas()
        .sort_values("vec_id")
    )
    cid = np.array([c for c, _ in cents])
    cmat = np.array([c for _, c in cents])
    acc = np.zeros((mat.shape[0], cmat.shape[0]))
    for d in range(mat.shape[1]):
        diff = mat[:, [d]] - cmat[:, d]
        acc += diff * diff
    sel = np.argmin(acc, axis=1)
    assert np.array_equal(enc["cell"].to_numpy(), cid[sel])
    resid = mat - cmat[sel]
    codes = np.vstack(enc["pq_codes"].to_numpy())
    for j, cb in enumerate(cbs):
        cbm = np.array(cb)
        sv = resid[:, j * _PQ_SUB:(j + 1) * _PQ_SUB]
        a2 = np.zeros((sv.shape[0], cbm.shape[0]))
        for d in range(sv.shape[1]):
            diff = sv[:, [d]] - cbm[:, d]
            a2 += diff * diff
        assert np.array_equal(codes[:, j], np.argmin(a2, axis=1)), j


def test_ivfpq_residual_coding_beats_raw_pq(spark, corpus):
    """The architectural claim: PQ over residuals reconstructs with
    less error than the same code budget over raw vectors."""
    from ciws_server_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_train,
    )

    rows, ids, mat = corpus
    cents, cbs = ivfpq_train(spark, SF)
    enc = (
        ivfpq_encode(rows, cents, cbs).toPandas().sort_values("vec_id")
    )
    cmat = {c: np.array(v) for c, v in cents}
    cbm = [np.array(cb) for cb in cbs]
    codes = np.vstack(enc["pq_codes"].to_numpy())
    cells = enc["cell"].to_numpy()
    recon = np.vstack(
        [
            np.concatenate(
                [cbm[j][codes[i, j]] for j in range(_PQ_M)]
            )
            + cmat[cells[i]]
            for i in range(len(mat))
        ]
    )
    ivfpq_err = ((mat - recon) ** 2).sum(axis=1).mean()

    raw_cbs = pq_train(spark, SF)
    raw = (
        pq_encode(rows, raw_cbs).toPandas().sort_values("vec_id")
    )
    rcodes = np.vstack(raw["pq_codes"].to_numpy())
    rcbm = [np.array(cb) for cb in raw_cbs]
    rrecon = np.vstack(
        [
            np.concatenate(
                [rcbm[j][rcodes[i, j]] for j in range(_PQ_M)]
            )
            for i in range(len(mat))
        ]
    )
    raw_err = ((mat - rrecon) ** 2).sum(axis=1).mean()
    assert ivfpq_err < raw_err, (ivfpq_err, raw_err)


def test_ivfpq_topk_probed_cell_correctness(spark, corpus):
    """ADC top-k within the probed cells must equal a numpy replay
    of the same LUT arithmetic (bit-exact), and the plan must filter
    on cell + TakeOrderedAndProject."""
    from ciws_server_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )

    rows, ids, mat = corpus
    cents, cbs = ivfpq_train(spark, SF)
    enc = ivfpq_encode(rows, cents, cbs).localCheckpoint(eager=True)
    q = [float(x) for x in mat[3]]
    out = ivfpq_topk(enc, cents, cbs, q, k=5, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    got = [(r["vec_id"], r["adc_dist"]) for r in out.collect()]

    # numpy replay
    qn = np.array(q)
    cmat = {c: np.array(v) for c, v in cents}
    order = sorted(
        cmat, key=lambda cid: (((qn - cmat[cid]) ** 2).sum(), cid)
    )
    probes = set(order[:2])
    pdf = enc.toPandas()
    cand = pdf[pdf["cell"].isin(probes)]
    def adc(row):
        rq = qn - cmat[row["cell"]]
        s = 0.0
        for j, cb in enumerate(cbs):
            qj = rq[j * _PQ_SUB:(j + 1) * _PQ_SUB]
            cent = np.array(cb)[row["pq_codes"][j]]
            t = 0.0
            for a, b in zip(qj, cent):
                t = t + (a - b) * (a - b)
            s += t
        return s
    want = sorted(
        ((int(r["vec_id"]), adc(r)) for _, r in cand.iterrows()),
        key=lambda t: (t[1], t[0]),
    )[:5]
    assert [v for v, _ in got] == [v for v, _ in want]
    for (gv, gd), (wv, wd) in zip(got, want):
        assert gd == pytest.approx(wd, rel=1e-12)
