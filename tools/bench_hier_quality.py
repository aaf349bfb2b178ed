"""Hier sub-codebook quality: seed-only vs Lloyd-refined (round-9 ask #6).

hier_codebook seeds each route's k2 sub-centroids from the k2 smallest-id
members — never refined — while the flat path has lloyd_refine. At a fixed
cell count, bad sub-centroids skew cell occupancy (hurting the hot-cell
cap) and can split true near-dup pairs across cells (hurting recall).
This measures both, seed vs lloyd_iters=1/2, on the synthetic embeddings:

- occupancy skew: per-cell member counts -> max/mean, p99/mean, top-cell
  share, empty-cell fraction;
- dup recall: fraction of EXACT cosine>=tau pairs (numpy all-pairs over
  the collected corpus — gate-scale only) whose two members land in the
  same (route, cell), i.e. would be scored by the per-cell gram kernel.

Usage: SPARK_GRAFT_CPUS=16 python tools/bench_hier_quality.py [sf_dir]
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from relationaldecomposition_spark.operators.ivf import (  # noqa: E402
    _np_assign_with_subs, hier_codebook, seed_centroids)
from relationaldecomposition_spark.session import get_spark  # noqa: E402
from relationaldecomposition_spark.sources.tables import (  # noqa: E402
    load_table)

K1_IDS = list(range(0, 480, 30))   # 16 coarse routes (o16's seed idiom)
K2 = 8                             # 128 cells total
TAUS = (0.35, 0.45)                # gate tau + near-dup band (max pair ~0.51)


def occupancy(assigned_pdf) -> dict:
    counts = assigned_pdf.groupby(["route", "cell"]).size().to_numpy()
    counts = np.sort(counts)[::-1]
    mean = counts.mean()
    return {
        "cells_nonempty": int(len(counts)),
        "max_over_mean": round(float(counts[0] / mean), 3),
        "p99_over_mean": round(float(
            np.percentile(counts, 99) / mean), 3),
        "top_cell_share": round(float(counts[0] / counts.sum()), 4),
    }


def recall(assigned_pdf, vecs: np.ndarray, ids: np.ndarray) -> dict:
    """Colocation recall. With multi-probe assignments (several rows per
    vec_id) a pair counts as colocated iff the two PROBED-CELL SETS
    intersect — exactly the pair set the within-cell kernel can see."""
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = norm @ norm.T
    iu = np.triu_indices(len(ids), k=1)
    cells_of: dict[int, set] = {}
    for _, r in assigned_pdf.iterrows():
        cells_of.setdefault(int(r["vec_id"]), set()).add(
            (int(r["route"]), int(r["cell"])))
    out = {}
    for tau in TAUS:
        mask = cos[iu] >= tau
        a, b = iu[0][mask], iu[1][mask]
        same = sum(1 for x, y in zip(a, b)
                   if cells_of[int(ids[x])] & cells_of[int(ids[y])])
        out[f"exact_pairs_t{tau}"] = int(mask.sum())
        out[f"recall_t{tau}"] = (round(same / mask.sum(), 4)
                                 if mask.sum() else None)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("hierq")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").persist()
    coarse = seed_centroids(emb, "embedding", "vec_id", K1_IDS)
    pdf_emb = emb.select("vec_id", "embedding").toPandas()
    ids = pdf_emb["vec_id"].to_numpy()
    vecs = np.array([np.asarray(v, dtype=np.float64)
                     for v in pdf_emb["embedding"]])
    out = {"sf_dir": sf_dir, "n": int(len(ids)), "k1": len(K1_IDS),
           "k2": K2, "taus": TAUS, "variants": {}}
    for iters in (0, 1, 2):
        subs = hier_codebook(emb, "embedding", "vec_id", coarse, K2,
                             lloyd_iters=iters).persist()
        assigned = (_np_assign_with_subs(emb, "embedding", "vec_id",
                                         coarse, subs)
                    .select("vec_id", "route", "cell").toPandas())
        out["variants"][f"lloyd{iters}"] = {
            **occupancy(assigned),
            **recall(assigned, vecs, ids)}
        if iters == 0:
            # multi-probe routing over the SAME seed codebook (round-10
            # ask #3): p nearest routes feed pair generation, recall is
            # set-intersection colocation; occupancy counts probe rows
            # (the real per-cell pair work)
            for p in (2, 3):
                ap = (_np_assign_with_subs(emb, "embedding", "vec_id",
                                           coarse, subs, route_probes=p)
                      .select("vec_id", "route", "cell").toPandas())
                out["variants"][f"seed_p{p}"] = {
                    **occupancy(ap), **recall(ap, vecs, ids)}
        subs.unpersist()
    # flat comparator at the SAME total cell count: 128 seed centroids,
    # single-level assignment — isolates what the two-level routing
    # itself costs vs the flat face the o44 plane uses
    from relationaldecomposition_spark.operators.ivf import _np_assigned
    flat_cents = seed_centroids(emb, "embedding", "vec_id",
                                list(range(0, 512, 4)))
    fa = (_np_assigned(emb, "embedding", "vec_id", flat_cents)
          .select("vec_id", F.lit(0).alias("route"), "cell").toPandas())
    out["variants"]["flat128"] = {**occupancy(fa), **recall(fa, vecs, ids)}
    emb.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
