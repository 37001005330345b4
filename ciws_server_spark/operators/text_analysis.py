"""Text analysis operators over `documents`.

Language ID (marker-token heuristic), quality scoring (length /
punctuation / stopword ratios), token counting, and document
fingerprinting. All are single-pass projections built from array and
string expressions (split / filter / regexp_replace) — codegen'd,
no shuffle except the final aggregates, embarrassingly parallel at any
scale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    arrow_normalized,
    md5_hex_list,
    md5_normalized,
    stopword_count,
    token_count,
    tokens,
    word_shingles,
)
from ..tables import spread_if_few_splits, table

#: Marker tokens per language for the n-gram/stopword heuristic.
#: Deterministic scoring is the contract; the marker lists are the
#: tunable part (kept tiny here).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "los", "que", "y"),
    "fr": ("le", "les", "des", "et", "une"),
    "zh": ("shi", "bu", "wo", "ni", "zhe"),
}


def docs_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan spread by doc_id before the per-row text work —
    ONLY when the scan yields fewer splits than cores
    (``tables.spread_if_few_splits``). Same rationale as
    dedup._shingle_sets: regex/tokenization cost dominates these
    operators, and when the corpus arrives as few parquet files the
    scan yields fewer partitions than cores (measured: 2 partitions at
    sf1 → the projection ran on 2 of 32 cores; repartitioning halved
    wall time). r16: the repartition was UNCONDITIONAL here — at
    cluster scale that is a full-corpus exchange of the text payload
    for nothing once the scan has ≥cores splits (guide §2.4); the
    conditional form still fires at every fixture scale (sf0.001–sf10
    documents ≤ ~60 MB < cores×128 MB), so local plans and results
    are unchanged."""
    return spread_if_few_splits(spark, table(spark, sf_dir, "documents"))


def _marker_score(col, markers: tuple[str, ...]):
    return F.array_size(F.filter(tokens(col), lambda w: w.isin(*markers)))


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + char stats per document."""
    docs = docs_scan(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def quality_exprs(col: str = "text") -> dict:
    """The quality-heuristic Columns, reusable by the standalone query
    and the composed curation pipeline (one formula, one place).

    score = 0.5·alpha_ratio + 0.3·min(stop_ratio·5, 1) +
            0.2·(1 if 3 ≤ avg_token_len ≤ 8 else 0)
    — a deterministic stand-in for a learned quality model.
    """
    n_tok = token_count(col).cast("double")
    alpha = F.length(F.regexp_replace(F.lower(col), r"[^a-z]", "")).cast(
        "double"
    )
    total = F.length(col).cast("double")
    stop = stopword_count(col).cast("double")
    alpha_ratio = alpha / total
    stop_ratio = stop / n_tok
    avg_tok_len = alpha / n_tok
    score = (
        F.lit(0.5) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.2)
        * F.when((avg_tok_len >= 3) & (avg_tok_len <= 8), 1.0).otherwise(0.0)
    )
    return {
        "n_tokens": n_tok.cast("long"),
        "alpha_ratio": F.round(alpha_ratio, 6),
        "stop_ratio": F.round(stop_ratio, 6),
        "avg_token_len": F.round(avg_tok_len, 6),
        "quality_score": F.round(score, 6),
    }


def predicted_lang_expr(col: str = "text"):
    """Marker-token language-ID Column (argmax, deterministic
    declaration-order tiebreak), shared with the pipeline."""
    scores = {
        lang: _marker_score(F.col(col), mk)
        for lang, mk in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    # first language (in declaration order) achieving the max wins
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best == 0, F.lit("unknown")).otherwise(pred)


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: alpha ratio, stopword ratio, mean token len
    (formula in ``quality_exprs``)."""
    docs = docs_scan(spark, sf_dir)
    q = quality_exprs("text")
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in q.items()]
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID with deterministic argmax tiebreak."""
    docs = docs_scan(spark, sf_dir)
    scores = {
        lang: _marker_score(F.col("text"), mk) for lang, mk in LANG_MARKERS.items()
    }
    return (
        docs.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            *[
                scores[lang].cast("long").alias(f"s_{lang}")
                for lang in LANG_MARKERS
            ],
            predicted_lang_expr("text").alias("predicted_lang"),
        )
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: content hash over canonical text.

    One Arrow stage computes the RE2 normalization once and emits
    hash + length + token count together — the expression form ran
    the JVM-regex normalization twice (once under md5, once under
    length), the same java.util.regex hot spot md5_normalized
    documents. Identical normalization semantics, same md5, so the
    output is bit-identical to the expression form and the oracle.
    """
    docs = docs_scan(spark, sf_dir)

    def fp_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in batches:
            arr = pa.Array.from_pandas(pdf["text"])
            x = arrow_normalized(arr)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fingerprint": md5_hex_list(x),
                    "n_chars_norm": pc.utf8_length(x).to_pandas(),
                    "n_tokens": pc.add(
                        pc.count_substring(arr, " "), 1
                    ).to_pandas(),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        fp_batches,
        "doc_id BIGINT, fingerprint STRING, n_chars_norm BIGINT,"
        " n_tokens BIGINT",
    )


#: BPE-ish pre-tokenizer: alpha runs | digit runs | punct runs — the
#: standard pre-split a BPE tokenizer applies before merges. Uses only
#: regex constructs with identical semantics in Java regex (Spark) and
#: RE2 (DuckDB): no lookahead, no backrefs.
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

#: Rolling-hash parameters (polynomial hash, exact int64 arithmetic:
#: max intermediate 1e9·131+255 < 2^63).
_RH_BASE = 131
_RH_MOD = 1_000_000_007


def text_tokenize_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-pre-tokenizer style (brief: "whitespace + a
    BPE-ish regex"): per-class token counts.

    Counts run through pyarrow's RE2-backed ``count_substring_regex``
    in one Arrow stage — the JVM form (4× ``regexp_extract_all`` +
    ``array_size``) was measured 28.7s at sf10 against ~3s here:
    java.util.regex is the cost (the same finding as md5_normalized;
    a plain-JVM regexp_count variant measured no faster than
    extract_all). The patterns use only constructs with identical
    semantics in Java regex, RE2, and DuckDB (character classes and
    alternation — no lookaround, no backrefs), so counts are exactly
    the oracle's. Whitespace token count = spaces + 1, the
    split-on-single-space convention (bit-equal to
    ``array_size(split(text, ' '))``, property-tested for the
    split-count identity in functions.text callers).
    """
    docs = docs_scan(spark, sf_dir)

    def count_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in batches:
            arr = pa.Array.from_pandas(pdf["text"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_ws_tokens": pc.add(
                        pc.count_substring(arr, " "), 1
                    ).to_pandas(),
                    "n_bpeish_tokens": pc.count_substring_regex(
                        arr, BPEISH_PATTERN
                    ).to_pandas(),
                    "n_alpha_runs": pc.count_substring_regex(
                        arr, "[A-Za-z]+"
                    ).to_pandas(),
                    "n_digit_runs": pc.count_substring_regex(
                        arr, "[0-9]+"
                    ).to_pandas(),
                    "n_punct_runs": pc.count_substring_regex(
                        arr, r"[^A-Za-z0-9\s]+"
                    ).to_pandas(),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        count_batches,
        "doc_id BIGINT, n_ws_tokens BIGINT, n_bpeish_tokens BIGINT,"
        " n_alpha_runs BIGINT, n_digit_runs BIGINT, n_punct_runs BIGINT",
    )


def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint via polynomial rolling hash over character
    codes: h ← (h·B + code) mod M, exact int64 — the incremental-hash
    form used for chunk-level dedup, cross-engine reproducible (unlike
    md5-of-whole-text it extends to streaming chunks)."""
    docs = docs_scan(spark, sf_dir)
    codes = F.transform(F.split(F.col("text"), ""), lambda ch: F.ascii(ch))
    rh = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _RH_BASE + c.cast("long")) % _RH_MOD,
    )
    return docs.select(
        "doc_id",
        rh.alias("rolling_hash"),
        F.length("text").cast("long").alias("n_chars"),
    )


#: Decontamination knobs: shingles present in more than _DECON_MAX_DF
#: docs are dropped as stop-shingles (both standard practice and the
#: scale bound — inverted-index fanout is capped at MAX_DF per
#: shingle); a train doc is contaminated if it shares at least
#: _DECON_MIN_OVERLAP surviving shingles with any eval doc.
_DECON_MAX_DF = 100
_DECON_MIN_OVERLAP = 3
_EVAL_MOD = 50  # doc_id % 50 == 0 → the held-out "benchmark" slice


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check — the decontamination pass every
    pretraining corpus needs: flag training documents that share
    ≥ ``_DECON_MIN_OVERLAP`` rare word-3-gram shingles with any
    held-out eval document (here the deterministic ``doc_id % 50``
    slice stands in for the benchmark set).

    Scale shape: document frequency is computed once (one groupBy);
    shingles with df > ``_DECON_MAX_DF`` are dropped BEFORE the
    train⋈eval join, so the inverted-index fanout is bounded at
    MAX_DF per shingle and the join cost is Σ matches on rare
    shingles — no all-pairs stage. The eval side is benchmark-sized
    (tiny vs the corpus) and broadcasts.
    """
    from ..functions.text import word_shingles

    docs = docs_scan(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles("text", 3))).alias("shingle"),
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(
        dfreq.where(F.col("df") <= _DECON_MAX_DF).select("shingle"), "shingle"
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    ev = rare.where(is_eval).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    tr = rare.where(~is_eval)
    overlap = (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= _DECON_MIN_OVERLAP)
    )
    w = W.partitionBy("doc_id").orderBy(
        F.desc("n_overlap"), F.asc("eval_id")
    )
    return (
        overlap.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("eval_id").alias("contaminated_by"),
            "n_overlap",
        )
        .orderBy("doc_id")
    )


def text_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus report: doc counts, unique-content counts
    (normalized fingerprint), exact token totals and mean quality —
    the summary table a curation run publishes per crawl/source.

    Mean quality routes through an exact DECIMAL sum divided by the
    count so the double result is execution-order independent
    (hash-stable across engines); one shuffle on the low-cardinality
    source key with partial aggregation.
    """
    docs = docs_scan(spark, sf_dir)
    q = quality_exprs("text")
    per_doc = docs.select(
        "source",
        md5_normalized("text").alias("fp"),
        q["n_tokens"].alias("n_tokens"),
        q["quality_score"].cast("decimal(20,6)").alias("q_dec"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("q_dec").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_quality"),
        )
        .orderBy("source")
    )


#: PII patterns — identical semantics in Java regex (Spark) and RE2
#: (DuckDB): char classes, bounded repeats, and \b word boundaries only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def _inject_pii(docs: DataFrame):
    """Deterministically splice synthetic PII into a subset of docs.

    The synthetic corpus is a PII-free word bag, so a redactor run
    directly on it would be vacuously green (all zeros). Injection by
    doc_id residue makes detection+redaction *provably exercised*:
    ~1/7 of docs gain an email, ~1/11 an IPv4, ~1/13 a phone number,
    and the oracle performs the identical splice in SQL.
    """
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), did, F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".25"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" call 555-867-5309")).otherwise(
            F.lit("")
        ),
    )


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count + redact emails / IPv4s / phone numbers.

    Single codegen'd projection (regexp_extract_all + chained
    regexp_replace), no shuffle — embarrassingly parallel at 100 TB.
    Redaction order (email → ip → phone) is part of the contract; the
    patterns are deliberately RE2-compatible so the same scrub runs on
    any engine. ``redacted_fp`` is md5 of the scrubbed text, proving
    byte-identical redaction against the oracle.
    """
    docs = docs_scan(spark, sf_dir)
    itext = _inject_pii(docs)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(itext, F.lit(PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(PII_IPV4),
            F.lit("<IP>"),
        ),
        F.lit(PII_PHONE),
        F.lit("<PHONE>"),
    )
    n = lambda pat: F.size(F.regexp_extract_all(itext, F.lit(pat), F.lit(0)))  # noqa: E731
    return docs.select(
        "doc_id",
        n(PII_EMAIL).cast("long").alias("n_emails"),
        n(PII_IPV4).cast("long").alias("n_ips"),
        n(PII_PHONE).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document.

    distinct_token_ratio plus duplicate word-2-gram / 3-gram fractions
    (fraction of n-gram occurrences that are repeats of an earlier one
    in the same doc). Pure array expressions over the token array —
    zero shuffle, codegen'd end to end; the natural long-document
    repetition filter for a training-data pipeline.
    """
    docs = docs_scan(spark, sf_dir)
    t = tokens("text")
    n_tok = F.array_size(t)

    def dup_frac(arr):
        sz = F.array_size(arr)
        return F.when(sz == 0, F.lit(0.0)).otherwise(
            F.round(
                F.lit(1.0)
                - F.array_size(F.array_distinct(arr)) / sz.cast("double"),
                6,
            )
        )

    distinct_ratio = F.round(
        F.array_size(F.array_distinct(t)) / n_tok.cast("double"), 6
    )
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        distinct_ratio.alias("distinct_token_ratio"),
        dup_frac(word_shingles("text", 2)).alias("dup_2gram_frac"),
        dup_frac(word_shingles("text", 3)).alias("dup_3gram_frac"),
        (distinct_ratio < 0.4).alias("is_repetitive"),
    )


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality proxy without a pretrained LM: mean
    per-word surprisal (bits) under the corpus's OWN unigram
    distribution — documents full of rare words score high, boilerplate
    scores low. The honest self-contained analogue of the
    perplexity-filter stage every web-scale curation pipeline runs.

    Plan: word explode → hash-agg vocabulary counts (map-side
    partials; the shuffle carries one row per distinct word), a 1-row
    total crossJoin (broadcast), a join back on the word, and a per-doc
    mean. The vocab derivation re-scans the pruned 2-column projection
    rather than checkpointing the exploded words (word-per-row is
    larger than the text it came from — opposite call to
    pack_sequences, whose cut frame is 5 longs/doc). At 100 TB the
    vocabulary is a table, not a broadcast — the word join is the same
    shuffle the count already paid, and AQE picks broadcast when the
    vocab is small (it does at bench SF). No driver state.
    """
    docs = docs_scan(spark, sf_dir)
    w = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    vocab = w.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    bits = F.log2(F.col("total") / F.col("cnt"))
    return (
        w.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(bits), 6).alias("bits_per_word"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_tokenize_bpeish": text_tokenize_bpeish,
    "text_rolling_fingerprint": text_rolling_fingerprint,
    "text_decontaminate": text_decontaminate,
    "text_source_rollup": text_source_rollup,
    "text_pii_redact": text_pii_redact,
    "text_repetition": text_repetition,
    "text_unigram_logprob": text_unigram_logprob,
}

#: Locally oracle-checked, not driver-registered (50-entry budget):
#: ws token counting is subsumed by the BPE-ish tokenizer query and
#: md5 content fingerprinting by dedup_exact's fingerprint column.
#: r7 rotation: source_rollup/pii_redact/repetition (never
#: driver-verified) rotate in; quality/lang-id/tokenizer/rolling
#: fingerprint (driver-green r1-r6) yield slots.
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
    "text_decontaminate",
    "text_fingerprint",
    "text_lang_id",
    "text_pii_redact",
    # r16: text_quality_score rotated IN (changed-code rule — docs_scan)
    "text_repetition",
    "text_rolling_fingerprint",
    "text_source_rollup",
    "text_token_count",
    "text_tokenize_bpeish",
    "text_unigram_logprob",
}

_STOP_LIST_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
_NORM_SQL = (
    "TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)


def _marker_score_sql(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in markers)
    return (
        f"LEN(list_filter(string_split(text, ' '), w -> w IN ({lst})))"
    )


_LANG_SCORE_COLS = ",\n               ".join(
    f"CAST({_marker_score_sql(mk)} AS BIGINT) AS s_{lang}"
    for lang, mk in LANG_MARKERS.items()
)

_PRED_CASE = (
    "CASE WHEN GREATEST(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'unknown' "
    + " ".join(
        f"WHEN s_{lang} = GREATEST(s_en, s_de, s_es, s_fr, s_zh) THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    + " ELSE 'unknown' END"
)

ORACLES = {
    "text_token_count": """
        SELECT doc_id,
               CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents
        ORDER BY doc_id
    """,
    "text_quality_score": f"""
        WITH base AS (
          SELECT doc_id,
                 CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS n_tok,
                 CAST(LENGTH(regexp_replace(LOWER(text), '[^a-z]', '', 'g'))
                      AS DOUBLE) AS alpha,
                 CAST(LENGTH(text) AS DOUBLE) AS total,
                 CAST(LEN(list_filter(string_split(text, ' '),
                      w -> w IN {_STOP_LIST_SQL})) AS DOUBLE) AS stop
          FROM documents
        )
        SELECT doc_id,
               CAST(n_tok AS BIGINT) AS n_tokens,
               ROUND(alpha / total, 6) AS alpha_ratio,
               ROUND(stop / n_tok, 6) AS stop_ratio,
               ROUND(alpha / n_tok, 6) AS avg_token_len,
               ROUND(0.5 * (alpha / total)
                     + 0.3 * LEAST(stop / n_tok * 5, 1.0)
                     + 0.2 * (CASE WHEN alpha / n_tok >= 3
                                    AND alpha / n_tok <= 8
                                   THEN 1.0 ELSE 0.0 END), 6) AS quality_score
        FROM base
        ORDER BY doc_id
    """,
    "text_lang_id": f"""
        SELECT doc_id, labeled_lang, s_en, s_de, s_es, s_fr, s_zh,
               {_PRED_CASE} AS predicted_lang
        FROM (
          SELECT doc_id, lang AS labeled_lang,
               {_LANG_SCORE_COLS}
          FROM documents
        )
        ORDER BY doc_id
    """,
    "text_fingerprint": f"""
        SELECT doc_id,
               md5({_NORM_SQL}) AS fingerprint,
               CAST(LENGTH({_NORM_SQL}) AS BIGINT) AS n_chars_norm,
               CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
        ORDER BY doc_id
    """,
}

ORACLES["text_tokenize_bpeish"] = f"""
    SELECT doc_id,
           CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(LEN(regexp_extract_all(text, '{BPEISH_PATTERN}')) AS BIGINT)
             AS n_bpeish_tokens,
           CAST(LEN(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
             AS n_alpha_runs,
           CAST(LEN(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
             AS n_digit_runs,
           CAST(LEN(regexp_extract_all(text, '[^A-Za-z0-9\\s]+')) AS BIGINT)
             AS n_punct_runs
    FROM documents
    ORDER BY doc_id
"""

ORACLES["text_rolling_fingerprint"] = f"""
    SELECT doc_id,
           CAST(list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split_regex(text, ''),
                                  x -> CAST(ascii(x) AS BIGINT))),
                 (acc, c) -> (acc * {_RH_BASE} + c) % {_RH_MOD})
             AS BIGINT) AS rolling_hash,
           CAST(LENGTH(text) AS BIGINT) AS n_chars
    FROM documents
    ORDER BY doc_id
"""

ORACLES["text_source_rollup"] = f"""
    WITH base AS (
      SELECT source,
             md5({_NORM_SQL}) AS fp,
             CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(ROUND(
               0.5 * (CAST(LENGTH(regexp_replace(LOWER(text), '[^a-z]', '', 'g')) AS DOUBLE)
                      / CAST(LENGTH(text) AS DOUBLE))
               + 0.3 * LEAST(CAST(LEN(list_filter(string_split(text, ' '),
                               w -> w IN {_STOP_LIST_SQL})) AS DOUBLE)
                             / CAST(LEN(string_split(text, ' ')) AS DOUBLE) * 5, 1.0)
               + 0.2 * (CASE WHEN CAST(LENGTH(regexp_replace(LOWER(text), '[^a-z]', '', 'g')) AS DOUBLE)
                                  / CAST(LEN(string_split(text, ' ')) AS DOUBLE) >= 3
                              AND CAST(LENGTH(regexp_replace(LOWER(text), '[^a-z]', '', 'g')) AS DOUBLE)
                                  / CAST(LEN(string_split(text, ' ')) AS DOUBLE) <= 8
                             THEN 1.0 ELSE 0.0 END), 6) AS DECIMAL(20,6)) AS q_dec
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(q_dec) AS DOUBLE) / COUNT(*), 6) AS mean_quality
    FROM base
    GROUP BY source
    ORDER BY source
"""

#: Same shingle CTE the dedup oracles use (word_shingles parity is
#: already equality-tested there).
_SHINGLES_SQL = """
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       unnest(range(1, GREATEST(len(t) - 1, 1))) AS u(i)
"""

ORACLES["text_decontaminate"] = f"""
    WITH sh AS ({_SHINGLES_SQL}),
    dfq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
    rare AS (
      SELECT s.doc_id, s.shingle
      FROM sh s JOIN dfq d USING (shingle)
      WHERE d.df <= {_DECON_MAX_DF}
    ),
    ev AS (
      SELECT doc_id AS eval_id, shingle FROM rare
      WHERE doc_id % {_EVAL_MOD} = 0
    ),
    tr AS (
      SELECT doc_id, shingle FROM rare WHERE doc_id % {_EVAL_MOD} != 0
    ),
    ov AS (
      SELECT t.doc_id, e.eval_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM tr t JOIN ev e USING (shingle)
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_DECON_MIN_OVERLAP}
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY n_overlap DESC, eval_id) AS rk
      FROM ov
    )
    SELECT doc_id, eval_id AS contaminated_by, n_overlap
    FROM ranked WHERE rk = 1
    ORDER BY doc_id
"""

_INJECT_SQL = """
    text
    || CASE WHEN doc_id % 7 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com now' ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.25'
            ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' call 555-867-5309' ELSE '' END
"""

ORACLES["text_pii_redact"] = f"""
    WITH inj AS (SELECT doc_id, {_INJECT_SQL} AS itext FROM documents)
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(itext, '{PII_EMAIL}')) AS BIGINT)
               AS n_emails,
           CAST(LEN(regexp_extract_all(itext, '{PII_IPV4}')) AS BIGINT)
               AS n_ips,
           CAST(LEN(regexp_extract_all(itext, '{PII_PHONE}')) AS BIGINT)
               AS n_phones,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(itext, '{PII_EMAIL}', '<EMAIL>', 'g'),
                   '{PII_IPV4}', '<IP>', 'g'),
                 '{PII_PHONE}', '<PHONE>', 'g')) AS redacted_fp
    FROM inj
    ORDER BY doc_id
"""

ORACLES["text_repetition"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g2 AS (
      SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT g) AS nd
      FROM (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
            FROM t, unnest(range(1, len(t))) AS u(i))
      GROUP BY 1
    ),
    g3 AS (
      SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT g) AS nd
      FROM (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
            FROM t, unnest(range(1, len(t) - 1)) AS u(i))
      GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           ROUND(LEN(list_distinct(t.t)) / CAST(len(t.t) AS DOUBLE), 6)
               AS distinct_token_ratio,
           COALESCE(ROUND(1.0 - g2.nd / CAST(g2.n AS DOUBLE), 6), 0.0)
               AS dup_2gram_frac,
           COALESCE(ROUND(1.0 - g3.nd / CAST(g3.n AS DOUBLE), 6), 0.0)
               AS dup_3gram_frac,
           ROUND(LEN(list_distinct(t.t)) / CAST(len(t.t) AS DOUBLE), 6) < 0.4
               AS is_repetitive
    FROM t LEFT JOIN g2 USING (doc_id) LEFT JOIN g3 USING (doc_id)
    ORDER BY t.doc_id
"""

ORACLES["text_unigram_logprob"] = """
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    v AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
    t AS (SELECT SUM(cnt) AS total FROM v)
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           ROUND(AVG(LN(t.total / v.cnt) / LN(2)), 6) AS bits_per_word
    FROM w JOIN v USING (w) CROSS JOIN t
    GROUP BY w.doc_id
    ORDER BY w.doc_id
"""

HEADLINE = {"text_quality_score", "text_tokenize_bpeish"}
