"""Per-phase wall profile of the decompose_e2e bench row (round-14 ask
#8): mine min-seps -> enumerate -> validate 3 candidates -> bucketed
write. Prints one JSON line per phase and a dup-subtree audit of the
validator's fold plan.

In-pipeline attribution is noisy on this host (NOTES_r13 law 10) — run
solo, median of N, and treat the component split as a map of WHERE time
goes, not a precision measurement.

Usage: python tools/profile_decompose.py [sf_dir] [reps]
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from relationaldecomposition_spark.engine.decompose import (
        DecompositionValidator, write_decomposition_bucketed)
    from relationaldecomposition_spark.engine.measures import MeasureEngine
    from relationaldecomposition_spark.engine.entropy import SparkEntropyEngine
    from relationaldecomposition_spark.mining.jd_miner import JDMiner
    from relationaldecomposition_spark.schema.acyclic import (
        AcyclicSchemaEnumerator, validate_schemas_concurrent)
    from relationaldecomposition_spark.session import get_spark
    from relationaldecomposition_spark.sources.tables import (
        denorm_customer_nation_region)

    spark = get_spark("profile_decompose")
    denorm = denorm_customer_nation_region(spark, sf_dir)
    denorm.count()  # warm scan

    for rep in range(reps):
        t = {}
        t0 = time.monotonic()
        miner = JDMiner(MeasureEngine(SparkEntropyEngine(denorm)),
                        epsilon=0.0)
        miner.mine_all_min_seps()
        t["mine_min_seps"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        candidates = list(itertools.islice(
            AcyclicSchemaEnumerator(tuple(denorm.columns),
                                    sorted(miner.mined_jds, key=str)), 3))
        t["enumerate"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        v = DecompositionValidator(denorm)
        infos = validate_schemas_concurrent(v, candidates)
        t["validate3"] = round(time.monotonic() - t0, 3)

        best, best_key = None, None
        for schema, info in zip(candidates, infos):
            key = (int(info.spurious_tuples), -len(schema.clusters))
            if best_key is None or key < best_key:
                best, best_key = schema, key
        v.close()
        miner.eng.unpersist()

        t0 = time.monotonic()
        if best is not None:
            write_decomposition_bucketed(denorm, best.clusters,
                                         "c_nationkey",
                                         "bench_decomp_profile")
        t["write_bucketed"] = round(time.monotonic() - t0, 3)
        t["total"] = round(sum(t.values()), 3)
        print(json.dumps({"rep": rep, **t}))

    spark.stop()


if __name__ == "__main__":
    main()
