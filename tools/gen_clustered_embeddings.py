"""Seeded clustered-embedding fixture: mixture-of-Gaussians on the unit
sphere, matching the `embeddings` table schema (vec_id, embedding
array<float>, label) with `label` = the planted cluster id.

Why this exists (round-10 VERDICT "What's missing #2"): every scale-corpus
quality number so far (pq_quality_r10, hier_multiprobe_r10) was measured on
rotation-replicated near-UNIFORM random vectors — the adversarial regime
for PQ and IVF, where pairwise distances concentrate and quantization noise
reorders near-tied ranks. Real embedding corpora are clustered; absolute
recall claims need a fixture with planted cluster geometry.

Construction (all deterministic from --seed, no RNG state anywhere in the
distributed path):
- C cluster centers: driver-side seeded standard normals, L2-normalized
  (unit directions in dim-D space; cross-center cosines ~ N(0, 1/D)).
- each row: cluster = xxhash64(vec_id, seed) mod C; point =
  normalize(center + sigma * z) where z is a per-(row, dim) standard
  normal derived from xxhash64 via Box-Muller — generation is ONE
  expression-only projection over spark.range (JVM-side, whole-stage
  codegen, partition-invariant, no Python in the loop).
- expected within-cluster cosine ~ 1 / (1 + sigma^2 * D): sigma 0.14 at
  D=64 plants pairs straddling the tau 0.35/0.45 near-dup band the hier
  quality harness measures.

Usage:
  python tools/gen_clustered_embeddings.py --rows 200000 --clusters 64 \
      --dest .data/clustered200k            # PQ-quality scale corpus
  python tools/gen_clustered_embeddings.py --rows 4000 --clusters 32 \
      --dest .data/clustered4k              # hier all-pairs gate corpus
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relationaldecomposition_spark.session import get_spark  # noqa: E402

from relationaldecomposition_spark.sources.synthetic import (  # noqa: E402
    clustered_embeddings as build_df)


def build(spark, rows, dim, clusters, sigma, seed):
    """Thin wrapper kept for script-local naming; the generator itself is
    library code (sources/synthetic.clustered_embeddings)."""
    return build_df(spark, rows, dim=dim, clusters=clusters, sigma=sigma,
                    seed=seed)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--sigma", type=float, default=0.14)
    ap.add_argument("--seed", type=int, default=20260816)
    ap.add_argument("--files", type=int, default=32,
                    help="parquet file count (pinned layout; see "
                         "gen_scale_data.py's layout note)")
    ap.add_argument("--dest", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".data", "clustered200k"))
    args = ap.parse_args(argv)

    spark = get_spark("gen-clustered-embeddings")
    out = build(spark, args.rows, args.dim, args.clusters, args.sigma,
                args.seed)
    os.makedirs(args.dest, exist_ok=True)
    dest = f"{args.dest}/embeddings.parquet"
    out.repartition(args.files).write.mode("overwrite").parquet(dest)
    n = spark.read.parquet(dest).count()
    print(f"embeddings: {n} rows, {args.clusters} clusters, "
          f"sigma={args.sigma}, dim={args.dim} -> {dest}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
