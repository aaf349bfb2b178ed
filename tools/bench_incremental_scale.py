"""Round-7 scale rows for the two continuous-ingest probes (verdict ask #3):
does ingest cost stay ~flat as the INDEX grows, with the batch fixed?

Protocols (both write into SCALING.json):

semdedup_incremental — FIXED batch of 5k vectors (dim 32, clustered on 100
cells) probed against synthetic cell indexes of 0.2M / 2M / 20M rows at
FIXED occupancy 200 (so cells grow with the corpus: 1k / 10k / 100k).
Timed phases per point:
  - assign_sec: BLAS argmin of the batch against the full codebook
    (O(|batch| * cells * dim) — the term that grows with the CODEBOOK,
    reported separately because it is the flat-assignment economics
    question, not the probe question)
  - probe_sec: semdedup_incremental with a pre-assigned persisted batch —
    index scan + broadcast-prune + touched-slice pair scoring only.
The o63 claim under test is that probe_sec is ~flat in index size.

semdedup_incremental_hier — the round-8 counterpart for the o64 face: the
SAME fixed 5k batch probed against hier-structured indexes (coarse routes
far apart, k2 sub-cells per route, cell = route*k2+sub) of ~0.2M / 2M /
20M rows at fixed occupancy 200 — cells 1k / 10k / 100k with K1 = k2 =
sqrt(cells). Timed phases per point:
  - assign_sec: the TWO-LEVEL assignment (_np_assign_with_subs with the
    broadcast route-prune) of the batch against the persisted codebook —
    O(|batch| * (K1 + k2) * dim); the claim is this stays ~flat where the
    flat face's assign_sec grows linearly in cells
  - probe_sec: semdedup_incremental(..., subs=) end-to-end (assignment
    included — the production ingest call shape)
The geometry makes the two-level argmin exact (inter-route separation >>
intra-route spread), so hits match the flat semantics at each size.

band_index_merge / incremental_dedup — FIXED batch of 2k documents (half
of them near-dups of indexed docs) probed against minhash band indexes
built from 20k / 200k / 1M synthetic documents. Timed phases:
  - probe_sec: incremental_dedup(batch, index)
  - merge_sec: band_index_merge(index, batch) forced via count
Index generation cost is one-time and excluded (the stored index is the
premise of the operator).

Synthetic data is deterministic (cell centroids are a closed-form function
of the cell id; docs are token sequences derived from the doc id), written
once under .data/incr_scale/ and reused.

Usage: python tools/bench_incremental_scale.py [semdedup|band|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.path.join(REPO, ".data", "incr_scale")
DIM = 32
OCCUPANCY = 200
BATCH_VECS = 5_000
BATCH_CELLS = 100
TAU = 0.92
IDX_SIZES = [200_000, 2_000_000, 20_000_000]
DOC_SIZES = [20_000, 200_000, 1_000_000]
BATCH_DOCS = 2_000


def _centroids(cells: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-centroid per cell id, vectorized closed form."""
    d = np.arange(DIM)[None, :]
    c = cells.astype(np.float64)[:, None]
    return np.sin(0.7 * c + 1.3 * d) + 0.2 * np.cos(0.31 * c * (d + 1))


def _gen_index(spark, n: int, path: str) -> None:
    cells = n // OCCUPANCY

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            cell = ids % cells
            rng = np.random.default_rng(int(ids[0]) + 1)
            vecs = _centroids(cell) + rng.normal(0.0, 0.02, (len(ids), DIM))
            yield pd.DataFrame({"vec_id": ids, "v": list(vecs),
                                "cell": cell.astype(np.int64)})

    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)
    out = StructType([StructField("vec_id", LongType()),
                      StructField("v", ArrayType(DoubleType())),
                      StructField("cell", LongType())])
    (spark.range(n).mapInPandas(gen, out)
     .repartition(64, "cell").sortWithinPartitions("cell")
     .write.mode("overwrite").parquet(path))


def bench_semdedup(spark) -> dict:
    from pyspark.sql import functions as F

    from relationaldecomposition_spark.operators import ivf

    rng = np.random.default_rng(99)
    bcells = rng.integers(0, BATCH_CELLS, BATCH_VECS)
    bvecs = _centroids(bcells) + rng.normal(0.0, 0.02, (BATCH_VECS, DIM))
    import pandas as pd
    batch = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(BATCH_VECS, dtype=np.int64) + 10**12,
        "embedding": list(bvecs)})).persist()
    batch.count()

    rows = {}
    for n in IDX_SIZES:
        cells = n // OCCUPANCY
        path = os.path.join(DATA, f"semdedup_idx_{n}")
        if not os.path.exists(path):
            t0 = time.time()
            _gen_index(spark, n, path)
            print(f"generated {path} in {time.time()-t0:.0f}s", flush=True)
        index = spark.read.parquet(path)
        codebook = [(int(c), v.tolist())
                    for c, v in enumerate(_centroids(np.arange(cells)))]

        t0 = time.time()
        assigned = ivf.ivf_cell_index(batch, "embedding", "vec_id",
                                      codebook).persist()
        assigned.count()
        assign_sec = time.time() - t0

        t0 = time.time()
        out = ivf.semdedup_incremental(batch, index, "embedding", "vec_id",
                                       codebook, TAU, assigned=assigned)
        n_dups = out.where(~F.col("survives")).count()
        probe_sec = time.time() - t0
        assigned.unpersist()

        key = f"idx_{n}"
        rows[key] = {"index_rows": n, "cells": cells,
                     "batch": BATCH_VECS, "dim": DIM,
                     "occupancy": OCCUPANCY,
                     "assign_sec": round(assign_sec, 2),
                     "probe_sec": round(probe_sec, 2),
                     "batch_dups": n_dups}
        print(json.dumps({key: rows[key]}), flush=True)
    batch.unpersist()
    # fitted exponent of probe_sec over the 100x index-size span
    xs = np.log([rows[f"idx_{n}"]["index_rows"] for n in IDX_SIZES])
    ys = np.log([max(rows[f"idx_{n}"]["probe_sec"], 1e-3)
                 for n in IDX_SIZES])
    rows["probe_fitted_exponent"] = round(float(np.polyfit(xs, ys, 1)[0]), 3)
    return rows


HIER_LEVELS = [(32, 32), (100, 100), (316, 316)]  # (K1, k2): 1k/10k/100k


def _hier_centroids(cells: np.ndarray, k2: int) -> np.ndarray:
    """Hier-structured centroid per cell id: a large per-route term plus a
    small per-sub offset, so the coarse argmin is exact (route separation
    ~10 >> intra-route spread ~0.5 + batch noise 0.02)."""
    d = np.arange(DIM)[None, :]
    route = (cells // k2).astype(np.float64)[:, None]
    sub = (cells % k2).astype(np.float64)[:, None]
    return (10.0 * np.sin(0.9 * route + 1.7 * d)
            + 0.5 * np.sin(1.3 * sub + 0.7 * d))


def _gen_hier_index(spark, cells: int, k2: int, path: str) -> None:
    n = cells * OCCUPANCY

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            cell = ids % cells
            rng = np.random.default_rng(int(ids[0]) + 1)
            vecs = (_hier_centroids(cell, k2)
                    + rng.normal(0.0, 0.02, (len(ids), DIM)))
            yield pd.DataFrame({"vec_id": ids, "v": list(vecs),
                                "cell": cell.astype(np.int64)})

    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)
    out = StructType([StructField("vec_id", LongType()),
                      StructField("v", ArrayType(DoubleType())),
                      StructField("cell", LongType())])
    (spark.range(n).mapInPandas(gen, out)
     .repartition(64, "cell").sortWithinPartitions("cell")
     .write.mode("overwrite").parquet(path))


def bench_semdedup_hier(spark) -> dict:
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)

    from relationaldecomposition_spark.operators import ivf

    sub_schema = StructType([
        StructField("route", LongType()),
        StructField("cb", ArrayType(StructType([
            StructField("cell", LongType()),
            StructField("cv", ArrayType(DoubleType()))])))])

    # warm the Python workers / Arrow path once so the first timed row
    # isn't charged the session's worker spin-up
    warm = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(64, dtype=np.int64),
                      "embedding": list(np.ones((64, DIM)))}))
    ivf._np_assigned(warm, "embedding", "vec_id",
                     [(0, [0.0] * DIM)]).count()

    rows = {}
    for k1, k2 in HIER_LEVELS:
        cells = k1 * k2
        path = os.path.join(DATA, f"semdedup_hier_idx_{cells}")
        if not os.path.exists(path):
            t0 = time.time()
            _gen_hier_index(spark, cells, k2, path)
            print(f"generated {path} in {time.time()-t0:.0f}s", flush=True)
        index = spark.read.parquet(path)

        # persisted codebook: coarse = per-route mean-free large term
        # (fine offsets average out by construction), subs = the exact
        # per-route sub-centroid table
        d = np.arange(DIM)[None, :]
        r = np.arange(k1, dtype=np.float64)[:, None]
        coarse_mat = 10.0 * np.sin(0.9 * r + 1.7 * d)
        coarse = [(int(i), coarse_mat[i].tolist()) for i in range(k1)]
        all_cells = np.arange(cells, dtype=np.int64)
        cents = _hier_centroids(all_cells, k2)
        subs_pdf = pd.DataFrame({
            "route": np.arange(k1, dtype=np.int64),
            "cb": [[{"cell": int(c), "cv": cents[c].tolist()}
                    for c in range(rt * k2, (rt + 1) * k2)]
                   for rt in range(k1)]})
        subs = spark.createDataFrame(subs_pdf, sub_schema).persist()
        subs.count()

        # fixed batch clustered on 100 cells of THIS index's cell space
        rng = np.random.default_rng(99)
        pick = rng.integers(0, cells, BATCH_CELLS)
        bcells = pick[rng.integers(0, BATCH_CELLS, BATCH_VECS)]
        bvecs = (_hier_centroids(bcells, k2)
                 + rng.normal(0.0, 0.02, (BATCH_VECS, DIM)))
        batch = spark.createDataFrame(pd.DataFrame({
            "vec_id": np.arange(BATCH_VECS, dtype=np.int64) + 10**12,
            "embedding": list(bvecs)})).persist()
        batch.count()

        t0 = time.time()
        assigned = ivf._np_assign_with_subs(
            batch, "embedding", "vec_id", coarse, subs,
            prune_subs=True).select(F.col("vec_id"), "v", "cell").persist()
        assigned.count()
        assign_sec = time.time() - t0
        assigned.unpersist()

        t0 = time.time()
        out = ivf.semdedup_incremental(batch, index, "embedding", "vec_id",
                                       coarse, TAU, subs=subs)
        n_dups = out.where(~F.col("survives")).count()
        probe_sec = time.time() - t0
        batch.unpersist()
        subs.unpersist()

        key = f"cells_{cells}"
        rows[key] = {"index_rows": cells * OCCUPANCY, "cells": cells,
                     "k1": k1, "k2": k2,
                     "batch": BATCH_VECS, "dim": DIM,
                     "occupancy": OCCUPANCY,
                     "assign_sec": round(assign_sec, 2),
                     "probe_sec": round(probe_sec, 2),
                     "batch_dups": n_dups}
        print(json.dumps({key: rows[key]}), flush=True)
    keys = [f"cells_{k1 * k2}" for k1, k2 in HIER_LEVELS]
    xs = np.log([rows[k]["cells"] for k in keys])
    for phase in ("assign_sec", "probe_sec"):
        ys = np.log([max(rows[k][phase], 1e-3) for k in keys])
        rows[f"{phase.split('_')[0]}_fitted_exponent"] = round(
            float(np.polyfit(xs, ys, 1)[0]), 3)
    return rows


def _docs_pdf(ids: np.ndarray, dup_src: np.ndarray | None = None):
    """Deterministic 40-token docs; token vocab keyed off the doc id so
    near-dup structure is controlled: doc content is a function of
    `content_key`, so two rows with the same key are exact dups."""
    import pandas as pd
    keys = ids if dup_src is None else dup_src
    texts = [" ".join(f"tok{(int(k) * 37 + j * 11) % 50021}"
                      for j in range(40)) for k in keys]
    return pd.DataFrame({"doc_id": ids, "text": texts})


def bench_band(spark) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from relationaldecomposition_spark.operators import dedup

    out_schema = StructType([StructField("doc_id", LongType()),
                             StructField("text", StringType())])

    def gen(batches):
        for pdf in batches:
            yield _docs_pdf(pdf["id"].to_numpy())

    rows = {}
    for n in DOC_SIZES:
        path = os.path.join(DATA, f"band_idx_{n}")
        if not os.path.exists(path):
            t0 = time.time()
            docs = spark.range(n).mapInPandas(gen, out_schema)
            (dedup.minhash_band_index(docs, "text", "doc_id")
             .repartition(64, "band", "sig")
             .sortWithinPartitions("band", "sig")
             .write.mode("overwrite").parquet(path))
            print(f"generated {path} in {time.time()-t0:.0f}s", flush=True)
        index = spark.read.parquet(path)

        rng = np.random.default_rng(7)
        bids = np.arange(BATCH_DOCS, dtype=np.int64) + 10**12
        # half the batch duplicates indexed docs, half is fresh content
        src = np.where(np.arange(BATCH_DOCS) % 2 == 0,
                       rng.integers(0, n, BATCH_DOCS), bids)
        batch = spark.createDataFrame(_docs_pdf(bids, src)).persist()
        batch.count()

        t0 = time.time()
        probe = dedup.incremental_dedup(batch, index, "text", "doc_id")
        n_dups = probe.where(~F.col("survives")).count()
        probe_sec = time.time() - t0

        t0 = time.time()
        merged_rows = dedup.band_index_merge(index, batch, "text",
                                             "doc_id").count()
        merge_sec = time.time() - t0
        batch.unpersist()

        key = f"docs_{n}"
        rows[key] = {"index_docs": n, "batch": BATCH_DOCS,
                     "probe_sec": round(probe_sec, 2),
                     "merge_sec": round(merge_sec, 2),
                     "batch_dups": n_dups, "merged_rows": merged_rows}
        print(json.dumps({key: rows[key]}), flush=True)
    xs = np.log([rows[f"docs_{n}"]["index_docs"] for n in DOC_SIZES])
    ys = np.log([max(rows[f"docs_{n}"]["probe_sec"], 1e-3)
                 for n in DOC_SIZES])
    rows["probe_fitted_exponent"] = round(float(np.polyfit(xs, ys, 1)[0]), 3)
    return rows


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    os.makedirs(DATA, exist_ok=True)
    from relationaldecomposition_spark.session import get_spark
    spark = get_spark("bench_incremental_scale")

    scaling_path = os.path.join(REPO, "SCALING.json")
    with open(scaling_path) as f:
        sc = json.load(f)
    if which in ("semdedup", "all"):
        rows = bench_semdedup(spark)
        rows["note"] = (
            "o63 scale row: FIXED 5k-vector batch vs 100x index growth at "
            "fixed occupancy 200. probe_sec = index scan + broadcast "
            "touched-cell prune + pair scoring (the o63 claim); "
            "assign_sec = flat BLAS argmin vs the growing codebook, "
            "reported separately (grows with cells by design — the "
            "hierarchical-codebook question, see semdedup_hier_bigbook).")
        sc["semdedup_incremental_scale"] = rows
    if which in ("hier", "all"):
        rows = bench_semdedup_hier(spark)
        rows["note"] = (
            "o64 scale row: the SAME fixed 5k-vector batch assigned with "
            "the persisted two-level codebook (K1=k2=sqrt(cells), "
            "broadcast route-prune) vs 100x cell growth at fixed "
            "occupancy 200. assign_sec is the flat face's growing term "
            "(semdedup_incremental_scale: 0.96->15.16 s over the same "
            "span) replaced by the O(K1+k2) route; probe_sec is the "
            "end-to-end ingest call including assignment.")
        sc["semdedup_incremental_hier_scale"] = rows
    if which in ("band", "all"):
        rows = bench_band(spark)
        rows["note"] = (
            "o50/o59 scale row: FIXED 2k-doc batch (half near-dups) vs "
            "50x band-index growth. probe/merge shuffle only batch-sized "
            "sides after the round-7 broadcast prune; merge_sec counts "
            "the unioned index (scan-dominated).")
        sc["band_index_incremental_scale"] = rows
    with open(scaling_path, "w") as f:
        json.dump(sc, f, indent=1)
    print(f"updated {scaling_path}")
    spark.stop()


if __name__ == "__main__":
    main()
