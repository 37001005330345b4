"""Composed training-data curation pipeline.

The point of the dedup / quality / language operators is this
composition: produce the curated corpus a pretraining run would
consume. All three signals are expressed over ONE scan of
`documents`: quality and language are row-local Column expressions
(text_analysis.quality_exprs / predicted_lang_expr), and the
normalized-dedup keeper is a window over the fingerprint — so the
whole pipeline is one scan + one shuffle (the fingerprint window
partitioning). Round 2 joined three scans of the same table on
doc_id; composing at the expression level is what a 100 TB curation
pass needs — the corpus is read once.

Keep rule: quality_score ≥ 0.5 AND predicted language is 'en' AND the
document is the keeper (min doc_id) of its normalized-text duplicate
group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import normalized
from ..tables import table
from .dedup import ORACLES as DEDUP_ORACLES
from .text_analysis import ORACLES as TEXT_ORACLES
from .text_analysis import predicted_lang_expr, quality_exprs

_MIN_QUALITY = 0.5
_LANG = "en"


def pipeline_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → curated (doc_id, n_tokens, quality_score,
    predicted_lang) after quality/language/dedup gating."""
    docs = table(spark, sf_dir, "documents")
    q = quality_exprs("text")
    scored = docs.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["quality_score"].alias("quality_score"),
        predicted_lang_expr("text").alias("predicted_lang"),
        F.md5(normalized("text")).alias("fingerprint"),
    )
    is_kept = F.col("doc_id") == F.min("doc_id").over(
        W.partitionBy("fingerprint")
    )
    return (
        scored.withColumn("is_kept", is_kept)
        .where(
            F.col("is_kept")
            & (F.col("quality_score") >= _MIN_QUALITY)
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
