"""Measure PQ ranking quality at scale (SCALING.json `pq_quality_r10`):
recall@R of the true L2 nearest neighbor under ADC ranking on the sf10
scale embeddings (200k rows), probing every coarse cell to isolate
quantization quality from probe recall, across the two levers the module
header names — codebook size K and Lloyd refinement — plus the IVFADC-R
pipeline recall (ADC shortlist -> exact-cosine re-rank) against the exact
cosine top-k verifier.

The scale corpus is replica-structured (tools/gen_scale_data.py rotates
vectors per replica), so unlike the uniform-random gate rows it HAS
planted structure: each original row's rotated copies are far, but the
within-replica geometry repeats — closer to a real embedding corpus than
the gate data, and the regime where K/Lloyd levers should move recall.

Usage: python tools/bench_pq_quality.py [--dir .data/sf10] [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from relationaldecomposition_spark.operators import ivf, pq  # noqa: E402
from relationaldecomposition_spark.session import get_spark  # noqa: E402

M = 8
QIDS = list(range(10))
COARSE_IDS = list(range(0, 480, 30))      # 16 coarse cells (the o16/o76 set)
K16_IDS = COARSE_IDS                      # K=16 sub-codebooks (the o76 set)
K64_IDS = list(range(0, 1920, 30))        # K=64: 4x codes, same id stride
SHORTLIST = 100
TOPK = 5


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, ".data", "sf10"))
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.json"))
    args = ap.parse_args(argv)

    spark = get_spark("bench-pq-quality")
    emb = spark.read.parquet(os.path.join(args.dir, "embeddings.parquet"))
    n_rows = emb.count()

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.asarray([np.asarray(v, dtype=np.float64)
                      for v in pdf["embedding"]])
    by_id = {int(i): mat[k] for k, i in enumerate(ids)}

    # exact truths, driver-side (one 10 x n distance matrix each)
    qmat = np.asarray([by_id[q] for q in QIDS])
    d2 = ((qmat ** 2).sum(1)[:, None] - 2.0 * (qmat @ mat.T)
          + (mat ** 2).sum(1)[None, :])
    cos = ((qmat @ mat.T)
           / (np.linalg.norm(qmat, axis=1)[:, None]
              * np.linalg.norm(mat, axis=1)[None, :]))
    nn_l2, cos_top = {}, {}
    for qi, q in enumerate(QIDS):
        order = np.argsort(d2[qi], kind="stable")
        nn_l2[q] = int(ids[next(j for j in order if ids[j] != q)])
        corder = np.argsort(-cos[qi], kind="stable")
        cos_top[q] = set(
            [int(ids[j]) for j in corder if int(ids[j]) != q][:TOPK])

    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", COARSE_IDS)

    def recall_at(codebooks, r):
        got = pq.pq_topk(emb, "embedding", "vec_id", QIDS, r, m=M,
                         codebooks=codebooks, coarse_centroids=coarse,
                         n_probes=len(coarse), kernel="np").toPandas()
        byq = got.groupby("query_id")["neighbor_id"].apply(set).to_dict()
        return round(sum(nn_l2[q] in byq.get(q, set())
                         for q in QIDS) / len(QIDS), 2)

    def rerank_recall(codebooks):
        idx = pq.pq_cell_index(emb, "embedding", "vec_id", codebooks,
                               coarse)
        queries = emb.where(F.col("vec_id").isin(QIDS))
        short = pq.pq_topk_index(idx, queries, "embedding", "vec_id",
                                 SHORTLIST, codebooks, coarse,
                                 n_probes=len(coarse))
        rr = pq.pq_rerank(short, emb, "embedding", "vec_id",
                          TOPK).toPandas()
        hits = sum(int(r.neighbor_id) in cos_top[int(r.query_id)]
                   for r in rr.itertuples())
        return round(hits / (len(QIDS) * TOPK), 2)

    out: dict = {"rows": int(n_rows), "m": M, "queries": len(QIDS),
                 "probe": "all coarse cells (ranking quality isolated)"}
    for label, seed_ids, iters in [("k16_seed", K16_IDS, 0),
                                   ("k16_lloyd2", K16_IDS, 2),
                                   ("k64_seed", K64_IDS, 0),
                                   ("k64_lloyd2", K64_IDS, 2)]:
        cbs = pq.pq_seed_codebooks(emb, "embedding", "vec_id", M, seed_ids)
        if iters:
            cbs = pq.pq_lloyd_refine(emb, "embedding", "vec_id", cbs,
                                     iters)
        out[label] = {"K": len(seed_ids),
                      "recall_nn_at_10": recall_at(cbs, 10),
                      "recall_nn_at_100": recall_at(cbs, 100)}
        print(json.dumps({label: out[label]}), flush=True)

    # the shipped pipeline: o76 config + IVFADC-R refinement
    cbs16 = pq.pq_seed_codebooks(emb, "embedding", "vec_id", M, K16_IDS)
    out["ivfadc_r_k16_seed"] = {
        "shortlist": SHORTLIST,
        "recall_cos_top5": rerank_recall(cbs16),
        "note": ("ADC shortlist from the on-disk index shape, exact-cosine "
                 "re-rank (pq_rerank) vs the exact cosine top-5 verifier")}
    print(json.dumps({"ivfadc_r_k16_seed": out["ivfadc_r_k16_seed"]}),
          flush=True)

    spark.stop()
    with open(args.out) as f:
        rec = json.load(f)
    rec["pq_quality_r10"] = out
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
