"""Per-stage accounting for pipeline.curate_corpus (the bench
curation_e2e configuration) — materialize each persisted stage id frame
in order and time the increment, then the packed/funnel tails. One JSON
line; run in a solo subprocess per the measurement discipline.

Usage: python tools/profile_curation.py [sf_dir]
"""
import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from relationaldecomposition_spark.pipeline import curate_corpus
    from relationaldecomposition_spark.session import get_spark
    from relationaldecomposition_spark.sources.tables import load_table

    import bench

    spark = get_spark("profile_curation")
    # same warm-up discipline as bench.py
    li = load_table(spark, sf_dir, "lineitem")
    li.count()
    li.groupBy("l_returnflag").count().collect()

    docs = load_table(spark, sf_dir, "documents")
    bench_docs = docs.where(F.col("doc_id") % 20 == 7)
    held: list = []
    t0 = time.time()
    packed, funnel = curate_corpus(
        docs, "text", "doc_id",
        source_col="source",
        mixture={"src0": 0.5, "src1": 0.3, "src2": 0.2},
        benchmark=bench_docs, max_bucket=1000,
        pack_target=256, pack_shards=16,
        persist_stages=True, persisted_out=held)
    out = {"sf_dir": sf_dir, "plan_sec": round(time.time() - t0, 3)}
    stages = []
    for i, f in enumerate(held):
        t0 = time.time()
        n = f.count()
        stages.append({"i": i, "rows": n,
                       "sec": round(time.time() - t0, 3)})
    out["stage_persists"] = stages
    t0 = time.time()
    bench._force(packed)
    out["packed_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    bench._force(funnel)
    out["funnel_sec"] = round(time.time() - t0, 3)
    out["total_sec"] = round(out["plan_sec"]
                             + sum(s["sec"] for s in stages)
                             + out["packed_sec"] + out["funnel_sec"], 3)
    spark.catalog.clearCache()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
