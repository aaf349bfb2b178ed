"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line.

Headline set mirrors the reference workloads (BASELINE.md) plus the
beyond-reference pipeline operators:
  - entropy_batch32: 32 subset entropies in chunked grouping-sets jobs (A8)
  - mvd_sweep:       MVD measure sweep over one table (A19 over A8 batches)
  - spurious_fold:   3-cluster decomposition validation of the denormalized
                     customer⋈nation⋈region relation (A12+A13)
  - minsep_mine:     full minimal-separator mining on the 8-column denorm
                     (B10-B11, the SIGMOD'20 pipeline end-to-end)
  - flagship:        entry()-style measure + validation summary
  - lsh_dedup:       MinHash-LSH near-dup candidate pairs on documents
  - cosine_topk:     brute-force + LSH-bucketed ANN over embeddings
  - stream_window:   windowed + session aggregation over events (batch twin
                     of the streaming operators)
"""

from __future__ import annotations

import itertools
import json
import os
import re
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from relationaldecomposition_spark.engine.decompose import DecompositionValidator
    from relationaldecomposition_spark.engine.entropy import SparkEntropyEngine
    from relationaldecomposition_spark.engine.measures import MeasureEngine
    from relationaldecomposition_spark.queries import DECOMPOSITIONS
    from relationaldecomposition_spark.session import get_spark
    from relationaldecomposition_spark.sources.tables import (
        denorm_customer_nation_region, load_table)

    spark = get_spark("bench")
    timings: dict[str, float] = {}

    # warm the JVM/parquet footers out of the measurement
    load_table(spark, sf_dir, "lineitem").count()

    # --- entropy_batch32 -----------------------------------------------------
    t0 = time.time()
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_discount",
            "l_tax", "l_shipdate"]
    subsets = [frozenset(c) for r in (1, 2, 3)
               for c in itertools.combinations(cols, r)][:32]
    eng = SparkEntropyEngine(li)
    eng.entropies(subsets)
    timings["entropy_batch32"] = time.time() - t0

    # --- mvd_sweep -----------------------------------------------------------
    t0 = time.time()
    proj = li.select("l_returnflag", "l_linestatus", "l_quantity",
                     "l_discount", "l_tax")
    from relationaldecomposition_spark.core.deps import MVD
    meng = MeasureEngine(SparkEntropyEngine(proj))
    pcols = proj.columns
    cands = [MVD(frozenset((lhs,)), frozenset((rhs,)))
             for lhs in pcols for rhs in pcols if rhs != lhs]
    meng.measure_all(cands)  # one chunked grouping-sets pass for all subsets
    meng.engine.unpersist()
    timings["mvd_sweep"] = time.time() - t0
    eng.unpersist()

    # --- spurious_fold ---------------------------------------------------------
    t0 = time.time()
    denorm = denorm_customer_nation_region(spark, sf_dir)
    v = DecompositionValidator(denorm)
    for _, clusters in DECOMPOSITIONS:
        v.process_decomposition(clusters)
    v.close()
    timings["spurious_fold"] = time.time() - t0

    # --- flagship --------------------------------------------------------------
    t0 = time.time()
    meng = MeasureEngine(SparkEntropyEngine(denorm))
    meng.fd_measure(["c_nationkey"], ["n_name"])
    meng.mvd_measure(["c_nationkey"], ["n_name", "n_regionkey", "r_name"])
    meng.jd_measure(["c_nationkey"],
                    [["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
                     ["n_name", "n_regionkey", "r_name"]])
    meng.engine.unpersist()
    timings["flagship"] = time.time() - t0

    # --- minsep_mine: full SIGMOD'20 discovery on the 8-col denorm -------------
    from relationaldecomposition_spark.mining.jd_miner import JDMiner
    t0 = time.time()
    miner = JDMiner(MeasureEngine(SparkEntropyEngine(denorm)), epsilon=0.0)
    miner.mine_all_min_seps()
    miner.eng.unpersist()
    timings["minsep_mine"] = time.time() - t0

    # --- lsh_dedup --------------------------------------------------------------
    from relationaldecomposition_spark.operators.dedup import lsh_candidate_pairs
    t0 = time.time()
    docs = load_table(spark, sf_dir, "documents")
    lsh_candidate_pairs(docs, "text", "doc_id").count()
    timings["lsh_dedup"] = time.time() - t0

    # --- cosine_topk ------------------------------------------------------------
    from relationaldecomposition_spark.operators.similarity import (
        cosine_topk, lsh_bucketed_topk)
    t0 = time.time()
    emb = load_table(spark, sf_dir, "embeddings")
    cosine_topk(emb, "embedding", "vec_id", list(range(10)), 5).count()
    lsh_bucketed_topk(emb, "embedding", "vec_id", list(range(10)), 5).count()
    timings["cosine_topk"] = time.time() - t0

    # --- stream_window (batch twin) --------------------------------------------
    from relationaldecomposition_spark.streaming.events import (
        sessionize, windowed_counts)
    t0 = time.time()
    ev = load_table(spark, sf_dir, "events")
    windowed_counts(ev).count()
    sessionize(ev).count()
    timings["stream_window"] = time.time() - t0

    spark.stop()
    total = sum(timings.values())
    print(json.dumps({
        "metric": "headline_queries_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
