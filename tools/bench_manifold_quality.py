"""Hier-router quality on the PLANTED TWO-LEVEL manifold fixture
(sources/synthetic.hierarchical_embeddings — round-11 verdict ask #5).

`clustered_embeddings` characterized ANN quality on flat mixture
geometry; this measures the regime that actually stresses a two-level
router — clusters of clusters, where points near route boundaries get
mis-routed at the COARSE level and only `route_probes` recovery can see
their within-tau partners. Rows:

- colocation recall of EXACT cosine>=tau pairs under hier routing
  (hier_codebook seed idiom, k1 x k2 matched to the planted 8x8) at
  route_probes 1/2/3, same set-intersection protocol as
  bench_hier_quality;
- a flat comparator at the SAME total cell count (what single-level
  routing buys on hierarchical data);
- PQ ranking quality on the fixture: ADC-at-probe-all top-100 recall of
  the exact cosine top-100 (the bench_pq_quality protocol), seed and
  Lloyd-2 codebooks.

Usage: SPARK_GRAFT_CPUS=16 python tools/bench_manifold_quality.py [rows]
Prints one JSON line (recorded as SCALING.json manifold_quality_r12).
"""
from __future__ import annotations

import json
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from relationaldecomposition_spark.operators.ivf import (  # noqa: E402
    _np_assign_with_subs, _np_assigned, hier_codebook, seed_centroids)
from relationaldecomposition_spark.operators import pq  # noqa: E402
from relationaldecomposition_spark.session import get_spark  # noqa: E402
from relationaldecomposition_spark.sources.synthetic import (  # noqa: E402
    hierarchical_embeddings)

DIM = 64
ROUTES, SUBS = 8, 8            # planted 8x8 = 64 components
K2 = 8                         # router k2, cells = k1*k2 = 64 (matched)
TAUS = (0.35, 0.45)
M = 8                          # PQ subspaces
N_QUERIES = 20


def colocation(assigned_pdf, cos, iu, ids) -> dict:
    cells_of: dict[int, set] = {}
    for r in assigned_pdf.itertuples():
        cells_of.setdefault(int(r.vec_id), set()).add(
            (int(r.route), int(r.cell)))
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


def pq_recall_at(emb, cos, ids, cbs, k: int = 100) -> float:
    """Fraction of the exact cosine top-k recovered by ADC top-k at
    probe-all (candidates exact — pure ranking quality)."""
    id_list = [int(i) for i in ids]
    qids = id_list[:N_QUERIES]
    pos = {v: i for i, v in enumerate(id_list)}
    coarse = seed_centroids(emb, "embedding", "vec_id", SEED_IDS)
    got = pq.pq_topk(emb, "embedding", "vec_id", qids, k, m=M,
                     codebooks=cbs, coarse_centroids=coarse,
                     n_probes=len(coarse), kernel="np").toPandas()
    hits = 0
    for q in qids:
        row = cos[pos[q]].copy()
        row[pos[q]] = -np.inf
        exact = {id_list[j] for j in np.argpartition(-row, k)[:k]}
        mine = set(got[got.query_id == q].neighbor_id.astype(int))
        hits += len(exact & mine)
    return round(hits / (len(qids) * k), 4)


def main():
    global SEED_IDS
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    spark = get_spark("manifoldq")
    spark.sparkContext.setLogLevel("ERROR")
    emb = hierarchical_embeddings(spark, rows, dim=DIM, routes=ROUTES,
                                  subs_per_route=SUBS).persist()
    K1_IDS = list(range(0, rows, max(1, rows // ROUTES)))[:ROUTES]
    SEED_IDS = list(range(0, rows, max(1, rows // 16)))[:16]  # 16 PQ codes
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    vecs = np.array([np.asarray(v, dtype=np.float64)
                     for v in pdf["embedding"]])
    cos = vecs @ vecs.T
    iu = np.triu_indices(len(ids), k=1)

    coarse = seed_centroids(emb, "embedding", "vec_id", K1_IDS)
    subs = hier_codebook(emb, "embedding", "vec_id", coarse, K2).persist()
    out = {"rows": rows, "dim": DIM, "planted": f"{ROUTES}x{SUBS}",
           "router": f"k1={len(K1_IDS)} k2={K2}", "variants": {}}
    for p in (1, 2, 3):
        ap = (_np_assign_with_subs(emb, "embedding", "vec_id", coarse,
                                   subs, route_probes=p)
              .select("vec_id", "route", "cell").toPandas())
        out["variants"][f"hier_p{p}"] = colocation(ap, cos, iu, ids)
    n_flat = len(K1_IDS) * K2
    flat_cents = seed_centroids(
        emb, "embedding", "vec_id",
        list(range(0, rows, max(1, rows // n_flat)))[:n_flat])
    fa = (_np_assigned(emb, "embedding", "vec_id", flat_cents)
          .select("vec_id", F.lit(0).alias("route"), "cell").toPandas())
    out["variants"]["flat_equal_cells"] = colocation(fa, cos, iu, ids)

    cbs = pq.pq_seed_codebooks(emb, "embedding", "vec_id", M, SEED_IDS)
    out["pq_recall_at_100_seed"] = pq_recall_at(emb, cos, ids, cbs)
    cbs2 = pq.pq_lloyd_refine(emb, "embedding", "vec_id", cbs, 2)
    out["pq_recall_at_100_lloyd2"] = pq_recall_at(emb, cos, ids, cbs2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
