"""Similarity search over an embedding column (array<float>).

Two paths:
- brute-force cosine top-k: exact, one crossJoin + per-query window. The
  correctness baseline and the small-query-set path (broadcast queries).
- LSH-bucketed top-k: sign-random-projection buckets (deterministic seeded
  hyperplanes) shrink the candidate set; exact cosine re-rank inside the
  bucket. The 100 TB path: candidates shuffle on bucket signature instead
  of the full cross product. Recall < 1 by construction; multi-probe =
  union over p nearby buckets would raise it (not needed for the oracle).

Hyperplanes are generated from a seeded PRNG and embedded as plan literals
(JVM-side arithmetic), so the DuckDB oracle can embed the exact same
constants — results are bit-comparable.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _dot, _norm

DEFAULT_DIM = 64
DEFAULT_N_PLANES = 8


def random_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-free hyperplanes; +-1 entries keep the literal SQL
    small and the dot products exact in both engines."""
    rng = random.Random(seed)
    return [[float(rng.choice((-1, 1))) for _ in range(dim)]
            for _ in range(n_planes)]


def _as_double(vec_col):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def cosine_topk(df: DataFrame, vec_col: str, id_col: str,
                query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k neighbors for the given query ids (excluding self).
    Queries are a tiny broadcast side; candidates never collect."""
    base = df.select(F.col(id_col), _as_double(vec_col).alias("v")) \
             .withColumn("n", _norm(F.col("v")))
    q = base.where(F.col(id_col).isin(query_ids)) \
            .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
                    F.col("n").alias("qn"))
    scored = (base.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      (_dot(F.col("qv"), F.col("v"))
                       / (F.col("qn") * F.col("n"))).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def lsh_bucket_signature(df: DataFrame, vec_col: str, id_col: str,
                         n_planes: int = DEFAULT_N_PLANES,
                         dim: int = DEFAULT_DIM, seed: int = 42) -> DataFrame:
    """Bucket id = bit vector of sign(v . r_i) over the seeded hyperplanes."""
    planes = random_hyperplanes(n_planes, dim, seed)
    v = _as_double(vec_col)
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        r = F.array(*[F.lit(x) for x in plane])
        bit = (_dot(v, r) > 0).cast("long")
        sig = sig + F.shiftleft(bit, i)
    return df.select(F.col(id_col), sig.alias("bucket"))


def lsh_bucketed_topk(df: DataFrame, vec_col: str, id_col: str,
                      query_ids: list[int], k: int = 5,
                      n_planes: int = DEFAULT_N_PLANES,
                      dim: int = DEFAULT_DIM, seed: int = 42) -> DataFrame:
    """Approximate top-k: exact cosine re-rank restricted to the query's
    bucket. Join is on bucket equality — linear shuffle, no cross product."""
    buckets = lsh_bucket_signature(df, vec_col, id_col, n_planes, dim, seed)
    base = (df.select(F.col(id_col), _as_double(vec_col).alias("v"))
            .withColumn("n", _norm(F.col("v")))
            .join(buckets, id_col))
    q = base.where(F.col(id_col).isin(query_ids)) \
            .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
                    F.col("n").alias("qn"), F.col("bucket").alias("qbucket"))
    scored = (base.join(F.broadcast(q),
                        (F.col("bucket") == F.col("qbucket"))
                        & (F.col(id_col) != F.col("query_id")))
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      (_dot(F.col("qv"), F.col("v"))
                       / (F.col("qn") * F.col("n"))).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
