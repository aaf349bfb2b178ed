"""Interleaved same-session A/B of the minhash kernel default (r14
verdict ask #1) on the EXACT bench closures, plus an arrow+eager variant
probing the lazy-checkpoint single-job race (ask #6: the band self-join's
two sides race a LAZY localCheckpoint's materialization inside one job,
so the kernel evaluates twice per pairs job).

Modes:
- arrow       : r14 default (mapInPandas signature kernel, lazy ckpt)
- expr        : the r1-r13 JVM expression path (lazy ckpt)
- arrow_eager : arrow kernel + EAGER materialize at the signature/banded
                boundary (dedup.local_materialize forced eager)

Each rep runs every mode (order alternating per rep) over every query,
in ONE Spark session; per-query medians + raw samples printed as JSON.

Usage: python tools/ab_minhash_kernel.py [reps] [q1 q2 ...]
env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from relationaldecomposition_spark.operators import dedup  # noqa: E402
from relationaldecomposition_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402

DEFAULT_QUERIES = ["lsh_dedup", "lsh_dedup_guarded", "dedup_pipeline",
                   "incremental_dedup", "curation_e2e"]

MODES = [("arrow", "arrow", False),
         ("expr", "expr", False),
         ("arrow_eager", "arrow", True)]

_ORIG_MAT = dedup.local_materialize


def _set_mode(kernel: str, eager: bool) -> None:
    d = list(dedup.minhash_signatures.__defaults__)
    d[-1] = kernel
    dedup.minhash_signatures.__defaults__ = tuple(d)
    if eager:
        dedup.local_materialize = (
            lambda df, eager=False: _ORIG_MAT(df, eager=True))
    else:
        dedup.local_materialize = _ORIG_MAT


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_minhash_kernel")
    qs = bench.build_queries(spark, sf_dir)
    qs = {k: qs[k] for k in names}
    samples: dict[str, dict[str, list[float]]] = {
        m: {k: [] for k in qs} for m, _, _ in MODES}
    # one unmeasured warm pass per (mode, query): JIT + parquet footers
    for mode, kernel, eager in MODES:
        _set_mode(kernel, eager)
        for fn in qs.values():
            fn()
    for rep in range(reps):
        order = MODES if rep % 2 == 0 else MODES[::-1]
        for mode, kernel, eager in order:
            _set_mode(kernel, eager)
            for k, fn in qs.items():
                spark.sparkContext.setJobDescription(f"{k}[{mode}] r{rep}")
                t0 = time.time()
                fn()
                samples[mode][k].append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    _set_mode("arrow", False)
    out = {mode: {k: round(statistics.median(v), 3)
                  for k, v in per.items()}
           for mode, per in samples.items()}
    out["_raw"] = {mode: {k: [round(x, 3) for x in v]
                          for k, v in per.items()}
                   for mode, per in samples.items()}
    out["_sf_dir"] = sf_dir
    out["_reps"] = reps
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
