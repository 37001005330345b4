"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns next to a typed metadata struct; decode/resize/
frame-sample run as Arrow-batched pandas functions over
``mapInPandas``. The image/audio codecs are not present in this
environment, so the decode step is a clearly-marked deterministic fake
(`_fake_decode`) — the Spark-side plumbing (schema, batch shape,
partitioning, UDF signature) is real and oracle-checked.

The corpus is derived deterministically from the driver's `documents`
table: payload = utf-8 bytes of the text, modality assigned by
``doc_id % 3`` (image/audio/video). That keeps everything reproducible
in the DuckDB oracle (md5/byte math on the same text).

Scale notes:
* The manifest query is a single-pass projection (codegen, no shuffle).
* ``mm_byte_stats`` streams Arrow batches through pandas — per-batch
  memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  regardless of corpus size; no shuffle, embarrassingly parallel.
* On a real cluster payloads live in the table (Parquet binary) or as
  object-store pointers; either way this plumbing is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..tables import spread_if_few_splits, table

MODALITIES = ("image", "audio", "video")


def _modality_col():
    return F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3).cast("int") + 1,
    )


def with_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, modality, meta struct, payload binary).

    The canonical multimodal layout: binary column + typed metadata.
    """
    return docs.select(
        "doc_id",
        _modality_col().alias("modality"),
        F.struct(
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def mm_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality manifest: the metadata/rollup query a pipeline runs
    before scheduling decode work (sizes drive batch packing)."""
    mm = with_payload(table(spark, sf_dir, "documents"))
    return (
        mm.select(
            "doc_id",
            "modality",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.md5("payload").alias("payload_md5"),
        )
    )


def mm_modality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup per modality: count / total bytes / biggest object."""
    mm = with_payload(table(spark, sf_dir, "documents"))
    return (
        mm.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.max("meta.n_bytes").alias("max_bytes"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("modality")
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("content_md5", StringType()),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """STUB for the real decoder (PIL/ffmpeg are not in this container).

    Deterministic byte statistics stand in for decoded features; a real
    deployment swaps only this function — the mapInPandas plumbing,
    schema and batch shape stay identical. Only exact-integer stats are
    computed here so cross-engine comparison is bit-exact; derived
    floats (byte_mean) are added Spark-side with engine-consistent
    rounding.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    return {
        "n_bytes": len(payload),
        "byte_sum": int(arr.sum(dtype=np.int64)),
        "content_md5": hashlib.md5(payload).hexdigest(),
    }


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [_fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out.insert(1, "modality", pdf["modality"].values)
        yield out[[f.name for f in _FEATURE_SCHEMA.fields]]


def mm_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    The decode itself is the `_fake_decode` stub; what this proves is
    the Arrow batch path: binary column → pandas bytes → typed feature
    frame, schema-stable, no driver collect.
    """
    mm = (
        with_payload(table(spark, sf_dir, "documents"))
        .select("doc_id", "modality", "payload")
    )
    # hash-spread before the pandas stage ONLY when the scan yields
    # fewer splits than cores: a single-row-group scan would otherwise
    # feed ONE python worker, while a many-split cluster scan needs no
    # extra full-payload exchange (guide §2.4; r16 — was unconditional)
    mm = spread_if_few_splits(spark, mm)
    feats = mm.mapInPandas(_extract_batches, schema=_FEATURE_SCHEMA)
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        "byte_sum",
        F.round(
            F.col("byte_sum").cast("double") / F.col("n_bytes").cast("double"), 6
        ).alias("byte_mean"),
        "content_md5",
    )


_FRAME_LEN = 64

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_frames", LongType()),
        StructField("first_frame_md5", StringType()),
        StructField("last_frame_md5", StringType()),
    ]
)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampling over binary payloads — the video/audio chunking
    stub (`_FRAME_LEN`-byte frames stand in for decoded frames; a real
    deployment replaces the slicing with the codec's frame iterator,
    the batch plumbing stays identical)."""
    for pdf in batches:
        rows = []
        for doc_id, modality, payload in zip(
            pdf["doc_id"], pdf["modality"], pdf["payload"]
        ):
            n = len(payload)
            n_frames = (n + _FRAME_LEN - 1) // _FRAME_LEN
            first = payload[:_FRAME_LEN]
            last = payload[(n_frames - 1) * _FRAME_LEN :] if n_frames else b""
            rows.append(
                {
                    "doc_id": doc_id,
                    "modality": modality,
                    "n_frames": n_frames,
                    "first_frame_md5": hashlib.md5(first).hexdigest(),
                    "last_frame_md5": hashlib.md5(last).hexdigest(),
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample the binary payloads via mapInPandas (brief item:
    decode / frame-sample as pandas over Arrow batches)."""
    mm = (
        with_payload(table(spark, sf_dir, "documents"))
        .select("doc_id", "modality", "payload")
    )
    # conditional spread before the pandas stage (see mm_byte_stats)
    mm = spread_if_few_splits(spark, mm)
    return mm.mapInPandas(_sample_frames, schema=_FRAME_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("orig_bytes", LongType()),
        StructField("resized_bytes", LongType()),
        StructField("resized_md5", StringType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """2× downsample stub: every other byte (a real deployment swaps
    in the codec's resampler; schema/batch plumbing identical)."""
    for pdf in batches:
        rows = []
        for doc_id, modality, payload in zip(
            pdf["doc_id"], pdf["modality"], pdf["payload"]
        ):
            resized = payload[::2]
            rows.append(
                {
                    "doc_id": doc_id,
                    "modality": modality,
                    "orig_bytes": len(payload),
                    "resized_bytes": len(resized),
                    "resized_md5": hashlib.md5(resized).hexdigest(),
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA.fields])


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample over binary payloads via mapInPandas."""
    mm = (
        with_payload(table(spark, sf_dir, "documents"))
        .select("doc_id", "modality", "payload")
    )
    # conditional spread before the pandas stage (see mm_byte_stats)
    mm = spread_if_few_splits(spark, mm)
    return mm.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)


_IMG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("decoder", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mode", StringType()),
        StructField("resized_md5", StringType()),
    ]
)

_THUMB = 8  # thumbnail edge for the resize feature

_UNSET = object()


def _stub_image_features(payload: bytes) -> dict:
    """Deterministic stand-in for the PIL decode: pseudo-dimensions
    from exact byte statistics, thumbnail md5 from the every-other-byte
    downsample — all cross-engine reproducible (DuckDB oracle)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    byte_sum = int(arr.sum(dtype=np.int64))
    return {
        "decoder": "stub",
        "width": 1 + len(payload) % 64,
        "height": 1 + byte_sum % 64,
        "mode": "STUB",
        "resized_md5": hashlib.md5(payload[::2]).hexdigest(),
    }


def _pil_image_features(payload: bytes, pil_image) -> dict:
    """REAL image decode + resize via PIL (import-gated, same pattern
    as the paramiko SFTP transport, sources/sftp_feeder.py:58-93):
    open → true width/height/mode, NEAREST-resample to a _THUMB² RGB
    thumbnail, md5 of its raw bytes. Exercised in tests through a
    stand-in Image module; a deployment with Pillow installed runs
    this branch unchanged."""
    import io

    img = pil_image.open(io.BytesIO(payload))
    thumb = img.convert("RGB").resize((_THUMB, _THUMB), resample=0)
    return {
        "decoder": "pil",
        "width": int(img.size[0]),
        "height": int(img.size[1]),
        "mode": str(img.mode),
        "resized_md5": hashlib.md5(thumb.tobytes()).hexdigest(),
    }


def mm_image_features(
    spark: SparkSession, sf_dir: str, pil_image=_UNSET
) -> DataFrame:
    """Image decode/resize features over the binary payload column.

    The codec is resolved ONCE on the driver at plan time: the real
    PIL branch when ``PIL.Image`` is importable (or an Image-like
    object is passed explicitly — how tests drive the real branch
    without Pillow in the container), else the deterministic stand-in.
    Either way the executor-side shape is identical: Arrow batches
    through ``mapInPandas``, one feature row per payload, no driver
    collect. The ``decoder`` column makes which branch ran auditable
    in the output itself.
    """
    if pil_image is _UNSET:
        try:
            from PIL import Image as pil_image  # noqa: N813
        except ImportError:
            pil_image = None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                feats = (
                    _pil_image_features(payload, pil_image)
                    if pil_image is not None
                    else _stub_image_features(payload)
                )
                rows.append({"doc_id": doc_id, "modality": modality, **feats})
            yield pd.DataFrame(
                rows, columns=[f.name for f in _IMG_SCHEMA.fields]
            )

    mm = (
        with_payload(table(spark, sf_dir, "documents"))
        .where(F.col("modality") == "image")
        .select("doc_id", "modality", "payload")
    )
    # conditional spread before the pandas stage (see mm_byte_stats)
    mm = spread_if_few_splits(spark, mm)
    return mm.mapInPandas(gen, schema=_IMG_SCHEMA)


def mm_image_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stand-in branch pinned explicitly — the oracle-checked
    form (the PIL branch's output depends on the codec library and is
    validated by unit tests instead)."""
    return mm_image_features(spark, sf_dir, pil_image=None)


QUERIES = {
    "mm_manifest": mm_manifest,
    "mm_modality_rollup": mm_modality_rollup,
    "mm_byte_stats": mm_byte_stats,
    "mm_frame_sample": mm_frame_sample,
    "mm_resize": mm_resize,
    "mm_image_features_stub": mm_image_features_stub,
}

EXTRA = {
    # r14 rotation (diff-driven + stalest-50, VERDICT r13 ask #4):
    # the registered set forces every query whose code path changed
    # in r13/r14 (q22's rewritten anti-join plan, the q1/q18 A/B
    # targets, this round's q3/q5 A/B targets) and fills the rest
    # with the stalest driver-grade records (mostly the r10 tier and
    # the r2-era similarity rows). Overlap with the r13 set: 2
    # queries (q3/q5, forced). Everything rotated out stays
    # oracle-checked every run by tests/test_extra_oracle.py and
    # tools/check_correctness.py.
    # r16: mm_byte_stats rotated IN (changed-code rule — the spread
    # before its mapInPandas stage became conditional this round)
    "mm_frame_sample",
    "mm_image_features_stub",
    "mm_manifest",
    "mm_modality_rollup",
    "mm_resize",
}

_MODALITY_SQL = (
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
    " ELSE 'video' END"
)

ORACLES = {
    "mm_manifest": f"""
        SELECT doc_id,
               {_MODALITY_SQL} AS modality,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
        ORDER BY doc_id
    """,
    "mm_modality_rollup": f"""
        SELECT {_MODALITY_SQL} AS modality,
               COUNT(*) AS n_objects,
               CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
               CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes,
               MIN(doc_id) AS min_doc_id
        FROM documents
        GROUP BY 1
        ORDER BY modality
    """,
    "mm_byte_stats": f"""
        WITH b AS (
          SELECT doc_id,
                 {_MODALITY_SQL} AS modality,
                 CAST(strlen(text) AS BIGINT) AS n_bytes,
                 CAST(list_sum(list_transform(string_split_regex(text, ''),
                      x -> ascii(x))) AS BIGINT) AS byte_sum,
                 md5(text) AS content_md5
          FROM documents
        )
        SELECT doc_id, modality, n_bytes, byte_sum,
               ROUND(CAST(byte_sum AS DOUBLE) / CAST(n_bytes AS DOUBLE), 6)
                 AS byte_mean,
               content_md5
        FROM b
        ORDER BY doc_id
    """,
}

ORACLES["mm_frame_sample"] = f"""
    SELECT doc_id,
           {_MODALITY_SQL} AS modality,
           CAST(CEIL(CAST(strlen(text) AS DOUBLE) / {_FRAME_LEN}) AS BIGINT)
             AS n_frames,
           md5(substring(text, 1, {_FRAME_LEN})) AS first_frame_md5,
           md5(substring(text,
               CAST((CEIL(CAST(strlen(text) AS DOUBLE) / {_FRAME_LEN}) - 1)
                    * {_FRAME_LEN} + 1 AS BIGINT),
               {_FRAME_LEN})) AS last_frame_md5
    FROM documents
    ORDER BY doc_id
"""

# keep-every-other-byte in SQL: regexp '(.)(.)' → first of each pair
# (plus any trailing odd byte) — identical semantics in RE2 and Java
ORACLES["mm_resize"] = f"""
    SELECT doc_id,
           {_MODALITY_SQL} AS modality,
           CAST(strlen(text) AS BIGINT) AS orig_bytes,
           CAST(strlen(regexp_replace(text, '(.)(.)', '\\1', 'g')) AS BIGINT)
             AS resized_bytes,
           md5(regexp_replace(text, '(.)(.)', '\\1', 'g')) AS resized_md5
    FROM documents
    ORDER BY doc_id
"""

ORACLES["mm_image_features_stub"] = f"""
    SELECT doc_id,
           'image' AS modality,
           'stub' AS decoder,
           CAST(1 + strlen(text) % 64 AS BIGINT) AS width,
           CAST(1 + list_sum(list_transform(string_split_regex(text, ''),
                x -> ascii(x))) % 64 AS BIGINT) AS height,
           'STUB' AS mode,
           md5(regexp_replace(text, '(.)(.)', '\\1', 'g')) AS resized_md5
    FROM documents
    WHERE CAST(doc_id % 3 AS INT) = 0
    ORDER BY doc_id
"""

HEADLINE = {"mm_byte_stats"}
