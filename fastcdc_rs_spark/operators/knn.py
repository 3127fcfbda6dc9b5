"""Similarity search over embedding columns (training-data pipeline ops).

* ``cosine_topk_bruteforce`` — exact top-k cosine neighbors per query:
  broadcast the (small) query set, JVM-side dot product via
  ``aggregate(zip_with(...))``, window top-k. The exact baseline.
* ``cosine_near_duplicates`` — all pairs with cosine >= threshold via a
  bucketed self-join (random-hyperplane LSH signs as the bucket key) with
  a brute-force fallback for small inputs.
* ``rhp_buckets`` — random-hyperplane (SimHash-for-vectors) bucket keys:
  the scale path; planes are a deterministic function of (dim, n_planes,
  seed) so results are reproducible and oracle-computable.

Vectors are ``array<float>`` columns; all arithmetic is JVM-side
(zip_with/aggregate inside whole-stage codegen), doubles rounded before
comparison (see functions/portable.py).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = [
    "cosine_expr",
    "cosine_topk_bruteforce",
    "cosine_near_duplicates",
    "rhp_buckets",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    na, nb = _norm(a), _norm(b)
    return F.when(
        (na > 0) & (nb > 0), _dot(a, b) / (na * nb)
    ).otherwise(F.lit(0.0))


def cosine_topk_bruteforce(
    vectors: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", round_scale: int = 6,
) -> DataFrame:
    """(query_id, vec_id, cosine, rank): exact top-k neighbors per query.

    The query side is broadcast (small by construction); ties broken by
    vec_id so results are deterministic.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    crossed = vectors.select(
        F.col(id_col), F.col(vec_col).alias("_vvec")
    ).crossJoin(F.broadcast(q))
    scored = crossed.select(
        query_id_col,
        id_col,
        F.round(cosine_expr(F.col("_qvec"), F.col("_vvec")), round_scale).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return [[float(x) for x in row] for row in rng.standard_normal((n_planes, dim))]


def rhp_buckets(vectors: DataFrame, dim: int, n_planes: int = 8, seed: int = 7,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket): sign pattern of n_planes random hyperplanes.

    Two vectors at angle θ land in the same bucket with probability
    (1 - θ/π)^n_planes — near-duplicates (cosine ~1) almost always collide.
    """
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(F.col(vec_col), F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return vectors.select(F.col(id_col), bucket.alias("bucket"))


def cosine_near_duplicates(
    vectors: DataFrame, threshold: float = 0.95, dim: int | None = None,
    n_planes: int = 0, seed: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding", round_scale: int = 6,
) -> DataFrame:
    """(a, b, cosine) pairs with cosine >= threshold.

    With ``n_planes`` > 0 the self-join is restricted to random-hyperplane
    buckets (the 100-TB path — the join key prunes the quadratic blow-up);
    with 0 it is the exact brute-force self-join (small inputs / oracle).
    """
    left = vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    right = vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    if n_planes > 0:
        assert dim is not None
        bk = rhp_buckets(vectors, dim, n_planes, seed, id_col, vec_col)
        left = left.join(bk.withColumnRenamed(id_col, "a"), "a")
        right = right.join(bk.withColumnRenamed(id_col, "b"), "b")
        joined = left.join(right, "bucket").where(F.col("a") < F.col("b"))
    else:
        joined = left.crossJoin(right).where(F.col("a") < F.col("b"))
    return (
        joined.select(
            "a", "b",
            F.round(cosine_expr(F.col("_va"), F.col("_vb")), round_scale).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
