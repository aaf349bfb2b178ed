"""Query-batch scaling of the two hier-PQ probe faces (round-11 verdict
ask #4): the default COLLECT face pulls the query batch to the driver to
compute static route/cell pushdown lists — right for probe-sized batches
— while the JOIN face (broadcast_queries=False) keeps the batch
distributed. This measures both over a fixed store as the query batch
grows (1k -> 100k synthetic queries), expecting the collect face's
driver-side numpy probe selection (O(batch x routes) single-threaded,
plus a batch-sized collect) to grow linearly while the join face stays
executor-parallel.

Store: hierarchical_embeddings(100k, dim=64) under an 8x64-cell hier
codebook, PQ M=8/K=16 — persisted route-partitioned like o77. Queries:
fresh rows from the same fixture (disjoint id range).

Usage: SPARK_GRAFT_CPUS=32 python tools/bench_pq_query_batch_scale.py
Prints one JSON line (recorded as SCALING.json pq_query_batch_r12).
"""
from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")
from relationaldecomposition_spark.operators import ivf, pq  # noqa: E402
from relationaldecomposition_spark.session import get_spark  # noqa: E402
from relationaldecomposition_spark.sources.synthetic import (  # noqa: E402
    hierarchical_embeddings)

import os

# r14 ask #5: the 10x regime is STORE_ROWS=500k with cells scaled
# proportionally (ROUTES=16, K2=250 -> 4000 cells, occupancy ~125 held
# fixed) — set SPARK_GRAFT_PQ_SCALE=10x. Default reproduces the r12/r13
# 50k-row protocol.
if os.environ.get("SPARK_GRAFT_PQ_SCALE") == "10x":
    STORE_ROWS, ROUTES, K2 = 500_000, 16, 250
else:
    STORE_ROWS, ROUTES, K2 = 50_000, 8, 50
    # 400 cells -> ~125 rows/cell: candidate volume (batch x n_probes x
    # occupancy) stays face-comparable without dominating the measurement
DIM = 64
M = 8
BATCHES = (1_000, 10_000, 100_000)
N_PROBES, ROUTE_PROBES = 4, 2
K = 5


def main():
    spark = get_spark("pq-batch-scale")
    spark.sparkContext.setLogLevel("ERROR")
    emb = hierarchical_embeddings(spark, STORE_ROWS + max(BATCHES),
                                  dim=DIM, routes=ROUTES,
                                  subs_per_route=K2)
    corpus = emb.where(f"vec_id < {STORE_ROWS}").persist()
    corpus.count()
    k1_ids = list(range(0, STORE_ROWS, STORE_ROWS // ROUTES))
    seed_ids = list(range(0, STORE_ROWS, STORE_ROWS // 16))[:16]
    coarse = ivf.seed_centroids(corpus, "embedding", "vec_id", k1_ids)
    subs = ivf.hier_codebook(corpus, "embedding", "vec_id", coarse,
                             K2).localCheckpoint(eager=True)
    cbs = pq.pq_seed_codebooks(corpus, "embedding", "vec_id", M, seed_ids)
    path = tempfile.mkdtemp(prefix="pq_batch_scale_")
    ivf.write_cell_index(
        pq.pq_cell_index_hier(corpus, "embedding", "vec_id", cbs, coarse,
                              subs),
        path, partition_col="route", sort_within=("cell",))
    stored = ivf.read_cell_index(spark, path, partition_col="route")

    print(f"store built: {stored.count()} rows", file=sys.stderr,
          flush=True)
    out = {"store_rows": STORE_ROWS, "dim": DIM,
           "router": f"k1={ROUTES} k2={K2}",
           "n_probes": N_PROBES, "route_probes": ROUTE_PROBES,
           "batches": {}}
    # r14: the join face is measured under BOTH probe kernels — "expr"
    # (the r12/r13 broadcast-join + interpreted-HOF face) and "np" (the
    # r14 Arrow selection kernel) — interleaved in one session so the
    # A/B is immune to cross-session host weather.
    faces = (("collect_face", True, "np"),
             ("join_face", False, "expr"),
             ("join_face_np", False, "np"))
    # warm every face once (JIT + python workers)
    for _, bq, kern in faces:
        pq.pq_topk_index_hier(
            stored, emb.where(f"vec_id >= {STORE_ROWS} "
                              f"AND vec_id < {STORE_ROWS + 200}"),
            "embedding", "vec_id", K, cbs, coarse, subs,
            n_probes=N_PROBES, route_probes=ROUTE_PROBES,
            broadcast_queries=bq, probe_kernel=kern).count()
    for n in BATCHES:
        queries = emb.where(f"vec_id >= {STORE_ROWS} "
                            f"AND vec_id < {STORE_ROWS + n}")
        row = {}
        for name, bq, kern in faces:
            t0 = time.time()
            cnt = pq.pq_topk_index_hier(
                stored, queries, "embedding", "vec_id", K, cbs, coarse,
                subs, n_probes=N_PROBES, route_probes=ROUTE_PROBES,
                broadcast_queries=bq, probe_kernel=kern).count()
            row[name] = round(time.time() - t0, 2)
            row[f"{name}_rows"] = cnt
            print(f"batch {n} {name}: {row[name]}s", file=sys.stderr,
                  flush=True)
        out["batches"][str(n)] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
