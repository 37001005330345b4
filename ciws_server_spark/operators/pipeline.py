"""Composed training-data curation pipeline.

The point of the dedup / quality / language operators is this
composition: produce the curated corpus a pretraining run would
consume. One declarative plan — Catalyst fuses the three single-pass
scoring projections into the same scan of `documents`; the only
shuffles are the dedup fingerprint groupBy and the final semi-join.

Keep rule: quality_score ≥ 0.5 AND predicted language is 'en' AND the
document is the keeper (min doc_id) of its normalized-text duplicate
group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import ORACLES as DEDUP_ORACLES
from .dedup import dedup_normalized
from .text_analysis import ORACLES as TEXT_ORACLES
from .text_analysis import text_lang_id, text_quality_score

_MIN_QUALITY = 0.5
_LANG = "en"


def pipeline_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → curated (doc_id, n_tokens, quality_score,
    predicted_lang) after quality/language/dedup gating."""
    quality = text_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    lang = text_lang_id(spark, sf_dir).select("doc_id", "predicted_lang")
    keepers = (
        dedup_normalized(spark, sf_dir)
        .where(F.col("is_kept"))
        .select("doc_id")
    )
    return (
        quality.join(lang, "doc_id")
        .join(keepers, "doc_id", "left_semi")
        .where(
            (F.col("quality_score") >= _MIN_QUALITY)
            & (F.col("predicted_lang") == _LANG)
        )
        .select("doc_id", "n_tokens", "quality_score", "predicted_lang")
    )


QUERIES = {"pipeline_curated_corpus": pipeline_curated_corpus}

ORACLES = {
    "pipeline_curated_corpus": f"""
        WITH quality AS (
            SELECT doc_id, n_tokens, quality_score
            FROM ({TEXT_ORACLES["text_quality_score"]})
        ),
        lang AS (
            SELECT doc_id, predicted_lang
            FROM ({TEXT_ORACLES["text_lang_id"]})
        ),
        keepers AS (
            SELECT doc_id FROM ({DEDUP_ORACLES["dedup_normalized"]})
            WHERE is_kept
        )
        SELECT q.doc_id, q.n_tokens, q.quality_score, l.predicted_lang
        FROM quality q
        JOIN lang l ON l.doc_id = q.doc_id
        WHERE q.doc_id IN (SELECT doc_id FROM keepers)
          AND q.quality_score >= {_MIN_QUALITY}
          AND l.predicted_lang = '{_LANG}'
        ORDER BY q.doc_id
    """,
}

HEADLINE = {"pipeline_curated_corpus"}
