"""Text primitives for the document-pipeline operators.

Everything is built from JVM-side array/string expressions
(split/transform/filter/aggregate) so shingling, token statistics and
hashing run inside codegen and scale linearly with input — no Python
in the hot path. Hash functions are md5-based because md5 is available
and bit-identical in both Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small stopword list used by quality scoring and language ID.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (single-space convention of the corpus)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.array_size(tokens(col))


def normalized(col: Column | str) -> Column:
    """Canonical text: lowercase, alnum+space only, collapsed spaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", ""), r" +", " ")
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (strings), order-preserving.

    tokens t[0..m-1] → shingles t[i]+' '+...+t[i+n-1] for i in 0..m-n.

    Higher-order functions are CodegenFallback (interpreted), so an
    expression like ``element_at(split(text), i)`` inside the lambda
    re-splits the WHOLE text for every element access — O(words²)
    splits per document (measured: ~4s for 5k docs). The token array
    is therefore bound ONCE as a lambda variable: transform over a
    singleton array makes ``arr`` an evaluated binding, and the inner
    lambda only does bound-array element_at + concat.
    """
    t = tokens(col)

    def shingles_of(arr: Column) -> Column:
        idx = F.when(
            F.array_size(arr) >= n,
            F.sequence(F.lit(1), F.array_size(arr) - F.lit(n - 1)),
        ).otherwise(F.expr("CAST(array() AS array<int>)"))
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(arr, i + j) for j in range(n)]
            ),
        )

    # sequence(1, m-n+1) with 1-based element_at; Spark's sequence
    # descends when end < start, so short docs need an explicit empty.
    return F.element_at(F.transform(F.array(t), shingles_of), 1)


def stopword_count(col: Column | str, words: tuple[str, ...] = STOPWORDS) -> Column:
    t = tokens(col)
    return F.array_size(F.filter(t, lambda w: w.isin(*words)))
