"""Synthetic clustered-embedding source: seeded mixture-of-Gaussians on
the unit sphere, matching the `embeddings` table schema (vec_id,
embedding array<float>, label) with `label` = the planted cluster id.

Why it exists: every ANN/dedup quality claim needs a corpus whose
ground-truth geometry is KNOWN. Uniform random vectors are the
adversarial regime (pairwise distances concentrate — PQ/IVF quality
levers barely move recall); real embedding corpora are clustered. This
source plants cluster structure with a tunable within-cluster cosine
(E[cos] ~ 1 / (1 + sigma^2 * dim)), so recall/precision floors can be
pinned as regression tests and measured at scale
(SCALING.json pq_quality_r11_clustered / hier_multiprobe_r11_clustered).

Construction is ONE expression-only projection over ``spark.range`` —
fully deterministic from (seed, vec_id, dim index) via counter-based
xxhash64 uniforms fed through Box-Muller, JVM-side, whole-stage-codegen,
partition-invariant (no RNG state, no Python in the loop — the same
discipline as gen_scale_data's id-modulo transforms):

- C cluster centers: driver-side seeded standard normals, L2-normalized
  (cross-center cosines ~ N(0, 1/dim)); a codebook-sized plan literal.
- each row: cluster = xxhash64(vec_id, seed) mod C; point =
  normalize(center + sigma * z), z a per-(row, dim) standard normal.

`tools/gen_clustered_embeddings.py` wraps this as a parquet generator.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

_U_BITS = 1 << 24  # 24-bit uniforms: plenty for Box-Muller, exact in double


def _u(salt: int, seed: int, d) -> F.Column:
    """Uniform in (0,1) from (vec_id, dim, seed, salt) — counter-based, so
    the value is a pure function of the row id (partitioning-invariant)."""
    h = F.xxhash64(F.col("vec_id"), d, F.lit(seed), F.lit(salt))
    return (F.pmod(h, F.lit(_U_BITS)).cast("double") + F.lit(0.5)) \
        / F.lit(float(_U_BITS))


def clustered_embeddings(spark: SparkSession, rows: int, dim: int = 64,
                         clusters: int = 64, sigma: float = 0.14,
                         seed: int = 20260816) -> DataFrame:
    """(vec_id, embedding: array<float>, label): `rows` unit vectors from
    a `clusters`-component Gaussian mixture on the sphere; `label` is the
    planted component. sigma 0.14 at dim 64 puts E[within-cluster cosine]
    ~ 0.44 (pairs straddle the 0.35/0.45 near-dup band); smaller sigma =
    tighter clusters."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers_lit = F.expr("array(" + ",".join(
        "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
        for c in centers) + ")")

    df = spark.range(rows).select(F.col("id").alias("vec_id"))
    label = F.pmod(F.xxhash64(F.col("vec_id"), F.lit(seed)),
                   F.lit(clusters)).cast("int")
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    two_pi = 2.0 * math.pi
    noise = F.transform(dims, lambda d: (
        F.sqrt(F.lit(-2.0) * F.log(_u(1, seed, d)))
        * F.cos(F.lit(two_pi) * _u(2, seed, d))))
    return (df.withColumn("label", label)
            .withColumn("_c", F.element_at(centers_lit,
                                           F.col("label") + F.lit(1)))
            .withColumn("_x", F.zip_with(
                "_c", noise, lambda c, z: c + F.lit(float(sigma)) * z))
            .withColumn("_n", F.sqrt(F.aggregate(
                F.transform("_x", lambda y: y * y),
                F.lit(0.0), lambda a, b: a + b)))
            .select("vec_id",
                    F.transform("_x", lambda y: (y / F.col("_n"))
                                .cast("float")).alias("embedding"),
                    "label"))


def hierarchical_embeddings(spark: SparkSession, rows: int, dim: int = 64,
                            routes: int = 8, subs_per_route: int = 8,
                            sigma_route: float = 0.14,
                            sigma: float = 0.08,
                            seed: int = 20260816) -> DataFrame:
    """(vec_id, embedding: array<float>, route_label, sub_label, label):
    a PLANTED TWO-LEVEL manifold — clusters of clusters (round-11 verdict
    ask #5). `clustered_embeddings` covers flat mixture geometry; real
    embedding corpora also have hierarchy (topics containing subtopics),
    which is exactly the regime where a two-level router can make ROUTE
    mistakes at route boundaries — the honest test bed for
    `hier_codebook` routing and `route_probes` recovery.

    Construction (same counter-based expression discipline as
    `clustered_embeddings`, one projection, partition-invariant):

    - `routes` route centers: seeded standard normals, L2-normalized.
    - `subs_per_route` sub-centers per route: normalize(route_center +
      sigma_route * g), g seeded normals — the planted sub-structure,
      E[cos(sub, route)] ~ 1/sqrt(1 + sigma_route^2 * dim).
    - each row: route/sub labels from independent xxhash64 streams;
      point = normalize(sub_center + sigma * z). Defaults at dim 64 put
      E[cos] within-sub ~0.71, within-route-cross-sub ~0.3, cross-route
      ~0 — near-dup pairs (tau ~0.45) live inside subs with a
      within-route tail.

    `label` = route_label * subs_per_route + sub_label (the flat planted
    component, comparable to `clustered_embeddings.label`)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rc = rng.standard_normal((routes, dim))
    rc /= np.linalg.norm(rc, axis=1, keepdims=True)
    sc = rc[:, None, :] + sigma_route * rng.standard_normal(
        (routes, subs_per_route, dim))
    sc = sc.reshape(routes * subs_per_route, dim)
    sc /= np.linalg.norm(sc, axis=1, keepdims=True)
    centers_lit = F.expr("array(" + ",".join(
        "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
        for c in sc) + ")")

    df = spark.range(rows).select(F.col("id").alias("vec_id"))
    route = F.pmod(F.xxhash64(F.col("vec_id"), F.lit(seed), F.lit(11)),
                   F.lit(routes)).cast("int")
    sub = F.pmod(F.xxhash64(F.col("vec_id"), F.lit(seed), F.lit(13)),
                 F.lit(subs_per_route)).cast("int")
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    two_pi = 2.0 * math.pi
    noise = F.transform(dims, lambda d: (
        F.sqrt(F.lit(-2.0) * F.log(_u(3, seed, d)))
        * F.cos(F.lit(two_pi) * _u(4, seed, d))))
    return (df.withColumn("route_label", route)
            .withColumn("sub_label", sub)
            .withColumn("label",
                        (F.col("route_label") * F.lit(subs_per_route)
                         + F.col("sub_label")).cast("int"))
            .withColumn("_c", F.element_at(centers_lit,
                                           F.col("label") + F.lit(1)))
            .withColumn("_x", F.zip_with(
                "_c", noise, lambda c, z: c + F.lit(float(sigma)) * z))
            .withColumn("_n", F.sqrt(F.aggregate(
                F.transform("_x", lambda y: y * y),
                F.lit(0.0), lambda a, b: a + b)))
            .select("vec_id",
                    F.transform("_x", lambda y: (y / F.col("_n"))
                                .cast("float")).alias("embedding"),
                    "route_label", "sub_label", "label"))
