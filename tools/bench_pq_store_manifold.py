"""o77-geometry probe quality on the planted two-level manifold fixture
(round-12 verdict ask #6): the route-partitioned PQ store's recall was
pinned on FLAT clustered geometry (SCALING pq_quality_r11_clustered),
while the manifold fixture proved SemDeDup's hier routing needs
route_probes >= 2 on clusters-of-clusters. This measures the SAME
question for the o77 plane: build `pq_cell_index_hier` -> write/read the
route-partitioned store -> `pq_topk_index_hier` at route_probes 1/2/3 x
an n_probes sweep, scoring PROBE recall — the fraction of the
probe-everything ADC top-k recovered at each partial-probe setting
(quantization quality held constant, so the number isolates what partial
probing loses on hierarchical geometry).

Usage: SPARK_GRAFT_CPUS=16 python tools/bench_pq_store_manifold.py [rows]
Prints one JSON line (recorded as SCALING.json pq_store_manifold_r13).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relationaldecomposition_spark.operators import ivf, pq  # noqa: E402
from relationaldecomposition_spark.session import get_spark  # noqa: E402
from relationaldecomposition_spark.sources.synthetic import (  # noqa: E402
    hierarchical_embeddings)

DIM = 64
ROUTES, SUBS = 8, 8
K2 = 8
M = 8
TOPK = 10
N_QUERIES = 20


def probe_recall_sweep(spark, emb, rows: int) -> dict:
    from pyspark.sql import functions as F

    k1_ids = list(range(0, rows, max(1, rows // ROUTES)))[:ROUTES]
    seed_ids = list(range(0, rows, max(1, rows // 16)))[:16]
    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", k1_ids)
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", coarse,
                             K2).localCheckpoint(eager=True)
    cbs = pq.pq_seed_codebooks(emb, "embedding", "vec_id", M, seed_ids)
    store = os.path.join(tempfile.mkdtemp(prefix="pq_store_manifold_"),
                         "store")
    ivf.write_cell_index(
        pq.pq_cell_index_hier(emb, "embedding", "vec_id", cbs, coarse,
                              subs),
        store, partition_col="route", sort_within=("cell",))
    stored = ivf.read_cell_index(spark, store, partition_col="route")
    qids = list(range(N_QUERIES))
    queries = emb.where(F.col("vec_id").isin(qids))

    def topk_rows(n_probes: int, route_probes: int) -> dict[int, set]:
        got = pq.pq_topk_index_hier(stored, queries, "embedding",
                                    "vec_id", TOPK, cbs, coarse, subs,
                                    n_probes=n_probes,
                                    route_probes=route_probes).collect()
        out: dict[int, set] = {}
        for r in got:
            out.setdefault(int(r["query_id"]), set()).add(
                int(r["neighbor_id"]))
        return out

    n_cells = ROUTES * K2
    full = topk_rows(n_cells, ROUTES)  # probe everything: the ADC ceiling
    denom = sum(len(v) for v in full.values())
    out = {"rows": rows, "dim": DIM, "planted": f"{ROUTES}x{SUBS}",
           "router": f"k1={ROUTES} k2={K2}", "topk": TOPK,
           "queries": N_QUERIES, "store": "route-partitioned (o77 layout)",
           "probe_recall_vs_probe_all": {}}
    for rp in (1, 2, 3):
        for np_ in (2, 4, 8, 16):
            got = topk_rows(np_, rp)
            hits = sum(len(full.get(q, set()) & got.get(q, set()))
                       for q in full)
            out["probe_recall_vs_probe_all"][f"rp{rp}_np{np_}"] = round(
                hits / denom, 4)
    return out


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    spark = get_spark("pq_store_manifold")
    spark.sparkContext.setLogLevel("ERROR")
    emb = hierarchical_embeddings(spark, rows, dim=DIM, routes=ROUTES,
                                  subs_per_route=SUBS).persist()
    emb.count()
    out = probe_recall_sweep(spark, emb, rows)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
