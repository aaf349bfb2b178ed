"""Settle the hierarchical SemDeDup face's one remaining claim (round-6
verdict ask #2): flat vs hierarchical assignment when the codebook is PAST
broadcast/closure size (>= ~1M cells), the regime the face was retained for
after flat won at every broadcastable size (SCALING semdedup_hier_vs_flat).

Protocol: synthetic clustered embeddings (k1 coarse centers, k2 sub-centers
per coarse, vectors = sub-center + noise), n fixed, total cells C = k1*k2
swept across the broadcast boundary. Both faces run kernel="gram" (BLAS
assignment + gram pair scoring) and count their pairs. The flat face ships
all C centroids in the mapInPandas closure (C * dim * 8 bytes to every
worker) and pays O(n * C * dim) argmin flops; the hierarchical face ships
only k1 centroids and pays O(n * (k1 + k2) * dim) plus two extra shuffles
(route window + sub-codebook join). Flat should win while C is small and
lose once the closure/flop term dominates — this records WHERE.

Usage: python tools/bench_hier_bigbook.py [out_json]
Appends/updates the "semdedup_hier_bigbook" key of SCALING.json by default.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 100_000
DIM = 32
TAU = 0.9
# total-cell sweep: 16k (comfortably broadcastable codebook, 4 MB),
# 250k (62 MB closure), 1M (256 MB closure — past any sane broadcast).
# Override with SWEEP_K="k1:k2,k1:k2" to run a subset (long 1M runs).
SWEEP = [(128, 128), (500, 500), (1000, 1000)]
if os.environ.get("SWEEP_K"):
    SWEEP = [tuple(int(x) for x in pair.split(":"))
             for pair in os.environ["SWEEP_K"].split(",")]


def make_data(spark, k1: int, k2: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    coarse = rng.normal(0.0, 1.0, (k1, DIM))
    sub_off = rng.normal(0.0, 0.12, (k1, k2, DIM))
    routes = rng.integers(0, k1, N_ROWS)
    subs = rng.integers(0, k2, N_ROWS)
    vecs = (coarse[routes] + sub_off[routes, subs]
            + rng.normal(0.0, 0.01, (N_ROWS, DIM)))
    import pandas as pd
    pdf = pd.DataFrame({"vec_id": np.arange(N_ROWS, dtype=np.int64),
                        "embedding": list(vecs)})
    df = spark.createDataFrame(pdf).repartition(32).persist()
    df.count()
    flat_cents = [(int(i * k2 + j), (coarse[i] + sub_off[i, j]).tolist())
                  for i in range(k1) for j in range(k2)]
    coarse_cents = [(int(i), coarse[i].tolist()) for i in range(k1)]
    return df, flat_cents, coarse_cents


def main() -> None:
    from relationaldecomposition_spark.operators import ivf
    from relationaldecomposition_spark.session import get_spark

    spark = get_spark("bench_hier_bigbook")
    rows = {}
    for k1, k2 in SWEEP:
        cells = k1 * k2
        df, flat_cents, coarse_cents = make_data(spark, k1, k2)
        closure_mb = cells * DIM * 8 / 2**20

        t0 = time.time()
        flat_pairs = ivf.semdedup_pairs(df, "embedding", "vec_id",
                                        flat_cents, TAU,
                                        kernel="gram").count()
        flat_sec = time.time() - t0

        t0 = time.time()
        hier_pairs = ivf.semdedup_pairs_hier(df, "embedding", "vec_id",
                                             coarse_cents, k2, TAU,
                                             kernel="gram").count()
        hier_sec = time.time() - t0

        key = f"cells_{cells}"
        rows[key] = {
            "rows": N_ROWS, "dim": DIM, "cells": cells, "k1": k1, "k2": k2,
            "flat_closure_mb": round(closure_mb, 1),
            "flat_sec": round(flat_sec, 2), "hier_sec": round(hier_sec, 2),
            "hier_speedup": round(flat_sec / hier_sec, 2),
            "flat_pairs": flat_pairs, "hier_pairs": hier_pairs,
        }
        print(json.dumps({key: rows[key]}), flush=True)
        df.unpersist()
    spark.stop()

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json")
    with open(out_path) as f:
        sc = json.load(f)
    rows = {**sc.get("semdedup_hier_bigbook", {}), **rows}
    rows["note"] = (
        "round-7 measurement of the face's last claim: hier wins once the "
        "flat codebook outgrows closure/broadcast economics. Synthetic "
        "clustered data, both faces kernel=gram, pair counts differ "
        "because cell partitions differ (both are within-cell subsets of "
        "the exact pair set).")
    sc["semdedup_hier_bigbook"] = rows
    with open(out_path, "w") as f:
        json.dump(sc, f, indent=1)
    print(f"wrote semdedup_hier_bigbook to {out_path}")


if __name__ == "__main__":
    main()
