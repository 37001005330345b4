"""Similarity search over the `embeddings` table (array<float>).

Two paths:

* ``sim_brute_topk`` — exact cosine top-k: the correctness baseline.
  The query set is broadcast (it is small by construction); the scan
  side streams through one pass, k results per query via ranked window.
* ``sim_lsh_buckets`` / ``sim_lsh_pairs`` — random-hyperplane LSH: the
  scale path. Hyperplane weights are derived from md5 (deterministic,
  recomputable on any engine — no RNG state to ship), each vector maps
  to an 8-bit bucket, and candidate pairs are generated only within a
  bucket: the O(n²) cross product becomes Σ bucket². Dot products are
  sequential folds (functions.vectors) so scores are bit-identical to
  the oracle's.

At 100 TB the LSH bucket id doubles as the table's partition key so
repeated ANN queries prune to matching buckets; an IVF (coarse
k-means) variant would follow the same layout with learned centroids.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot
from ..tables import table

_N_QUERIES = 10  # vec_id < 10 are the demo query vectors
_TOP_K = 5
_N_PLANES = 8
_DIM = 64
_LSH_COSINE_THRESHOLD = 0.5


def hyperplanes(n_planes: int = _N_PLANES, dim: int = _DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — identical in
    any engine/language, so the oracle can inline the same literals."""
    return [
        [
            int(hashlib.md5(f"hp:{p}:{d}".encode()).hexdigest()[0], 16) - 7.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _plane_dot_sql(plane: list[float], col: str = "e") -> str:
    """Left-associative explicit dot product (matches Spark's fold)."""
    return " + ".join(
        f"{col}[{i + 1}] * ({w})" for i, w in enumerate(plane)
    )


def _bucket_col(emb_col) -> F.Column:
    """LSH bucket id: bit p = sign of <v, plane_p>."""
    bucket = F.lit(0)
    for p, plane in enumerate(hyperplanes()):
        w = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(emb_col, w) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each query vector (broadcast queries)."""
    emb = table(spark, sf_dir, "embeddings")
    queries = F.broadcast(
        emb.where(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
    )
    scored = (
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
        .join(queries, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qe"), F.col("ne")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos", "rk")
        .orderBy("query_id", "rk")
    )


def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket assignment + occupancy (the ANN index layout)."""
    emb = table(spark, sf_dir, "embeddings")
    assigned = emb.withColumn("bucket", _bucket_col(F.col("embedding")))
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
            F.max("vec_id").alias("max_vec_id"),
        )
        .orderBy("bucket")
    )


def sim_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN candidate pairs: same bucket, verified cosine ≥ threshold."""
    emb = table(spark, sf_dir, "embeddings").withColumn(
        "bucket", _bucket_col(F.col("embedding"))
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("bucket").alias("ba"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("bucket").alias("bb"),
    )
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos", F.round(cosine(F.col("ea"), F.col("eb")), 6))
        .where(F.col("cos") >= _LSH_COSINE_THRESHOLD)
        .select("vec_a", "vec_b", F.col("ba").alias("bucket"), "cos")
    )


QUERIES = {
    "sim_brute_topk": sim_brute_topk,
    "sim_lsh_buckets": sim_lsh_buckets,
    "sim_lsh_pairs": sim_lsh_pairs,
}


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b})))"
    )


def _bucket_sql(col: str = "e") -> str:
    bits = [
        f"(CASE WHEN {_plane_dot_sql(plane, col)} > 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(hyperplanes())
    ]
    return "CAST(" + " + ".join(bits) + " AS INT)"


ORACLES = {
    "sim_brute_topk": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 ROUND({_cosine_sql('q.e', 'n.e')}, 6) AS cos
          FROM e q JOIN e n ON q.vec_id != n.vec_id
          WHERE q.vec_id < {_N_QUERIES}
        )
        SELECT query_id, neighbor_id, cos, rk FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id ASC) AS rk
          FROM scored
        )
        WHERE rk <= {_TOP_K}
        ORDER BY query_id, rk
    """,
    "sim_lsh_buckets": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        assigned AS (SELECT vec_id, {_bucket_sql('e')} AS bucket FROM e)
        SELECT bucket, COUNT(*) AS n_vectors,
               MIN(vec_id) AS min_vec_id, MAX(vec_id) AS max_vec_id
        FROM assigned
        GROUP BY bucket
        ORDER BY bucket
    """,
    "sim_lsh_pairs": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        assigned AS (SELECT vec_id, e, {_bucket_sql('e')} AS bucket FROM e)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
               ROUND({_cosine_sql('a.e', 'b.e')}, 6) AS cos
        FROM assigned a JOIN assigned b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE ROUND({_cosine_sql('a.e', 'b.e')}, 6) >= {_LSH_COSINE_THRESHOLD}
        ORDER BY vec_a, vec_b
    """,
}

HEADLINE = {"sim_brute_topk", "sim_lsh_pairs"}
