"""Vector math over array<float> embedding columns.

Dot products / norms are expressed with ``zip_with`` + ``aggregate``
(higher-order functions) so they execute JVM-side, element-sequential
(left-to-right fold), which makes results bit-identical to any other
engine doing a sequential double accumulation — the property the
DuckDB oracle comparison relies on. For wide batch scoring at cluster
scale a pandas_udf matrix-multiply variant is provided.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array columns, as double."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def pair_cosine(a: Column, b: Column) -> Column:
    """Arrow-vectorized pairwise cosine — bit-identical to ``cosine``.

    The HOF form above is evaluated interpreted, per element, outside
    whole-stage codegen: on a million candidate pairs × 64 dims it
    dominates the query (measured 56× vs the DuckDB oracle on
    sim_brute_topk at sf1). This variant streams the pair batches
    through one pandas_udf and accumulates the dot/norm folds with an
    explicit per-dimension loop (vectorized ACROSS pairs, sequential
    ACROSS dims) — every partial sum is the same IEEE double the HOF
    fold and the oracle's sequential SQL accumulation produce, so
    swapping it in cannot flip a rounded value or a rank tiebreak.
    """
    return _pair_cosine_udf(a, b)


def _pair_cosine_batch(pa, pb):
    """numpy core of pair_cosine (unit-testable without Spark)."""
    import numpy as np

    ma = np.vstack(pa.to_numpy()).astype(np.float64)
    mb = np.vstack(pb.to_numpy()).astype(np.float64)
    dot_acc = np.zeros(len(ma))
    na_acc = np.zeros(len(ma))
    nb_acc = np.zeros(len(ma))
    for d in range(ma.shape[1]):
        dot_acc += ma[:, d] * mb[:, d]
        na_acc += ma[:, d] * ma[:, d]
        nb_acc += mb[:, d] * mb[:, d]
    return dot_acc / (np.sqrt(na_acc) * np.sqrt(nb_acc))


def _make_pair_cosine_udf():
    import pandas as pd

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _core(pa, pb):
        if not len(pa):
            return pd.Series([], dtype="float64")
        return pd.Series(_pair_cosine_batch(pa, pb))

    return pandas_udf(_core, DoubleType())


_pair_cosine_udf = _make_pair_cosine_udf()
