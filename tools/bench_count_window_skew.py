"""Window-skew stress for the round-12 count-window shapes (r12 verdict
ask #8): tfidf_topk, unigram_xent_score and remove_duplicate_spans all
window-partition by token/shingle hash; a single token holding more than
a partition's worth of rows is the classic window-skew hazard at 100 TB.
This plants a 99%-ONE-TOKEN corpus matched to the sf1 documents table
(same doc count, same tokens/doc) and measures each shape's wall against
the real sf1 corpus — superlinear degradation means the two-pass
(salted pre-agg + broadcast hot keys) fallback is needed; ~1x means the
count window keeps the linear worst case (the r12 fully-dup-corpus
finding, now measured per shape at token grain).

Usage: SPARK_GRAFT_CPUS=32 python tools/bench_count_window_skew.py
Prints one JSON line (recorded as SCALING.json count_window_skew_r13).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from relationaldecomposition_spark.operators.corpus import (  # noqa: E402
    tfidf_topk, unigram_xent_score)
from relationaldecomposition_spark.operators.dedup import (  # noqa: E402
    remove_duplicate_spans)
from relationaldecomposition_spark.session import get_spark  # noqa: E402
from relationaldecomposition_spark.sources.tables import load_table  # noqa: E402

TOKENS_PER_DOC = 64  # ~ sf1's ~443 chars / ~7 chars-per-token


def planted_corpus(spark, n_docs: int):
    """(doc_id, text): every doc TOKENS_PER_DOC tokens, 99% the literal
    'hot', 1% unique per (doc, position) — one token owns 99% of the
    corpus's token occurrences AND its shingle table."""
    return (spark.range(n_docs).select(F.col("id").alias("doc_id"))
            .select("doc_id",
                    F.array_join(F.transform(
                        F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
                        lambda i: F.when(
                            (i + F.col("doc_id") * TOKENS_PER_DOC)
                            % 100 == 0,
                            F.concat(F.lit("u"),
                                     F.col("doc_id").cast("string"),
                                     F.lit("_"), i.cast("string"))
                        ).otherwise(F.lit("hot"))), " ").alias("text"))
            .repartition(32))


def main():
    spark = get_spark("cw_skew")
    spark.sparkContext.setLogLevel("ERROR")
    real = load_table(spark, os.path.join(REPO, ".data", "sf1"),
                      "documents").select("doc_id", "text")
    n_docs = real.count()
    skewed = planted_corpus(spark, n_docs)
    skewed.persist().count()
    real = real.persist()
    real.count()

    shapes = {
        "tfidf_topk": lambda df: tfidf_topk(df, "text", "doc_id"),
        "unigram_xent": lambda df: unigram_xent_score(df, "text",
                                                      "doc_id"),
        "remove_dup_spans": lambda df: remove_duplicate_spans(
            df, "text", "doc_id"),
    }
    out = {"n_docs": n_docs, "tokens_per_doc": TOKENS_PER_DOC,
           "hot_share": 0.99, "shapes": {}}
    for name, fn in shapes.items():
        row = {}
        for corpus, df in (("real_sf1", real), ("planted_99_hot", skewed)):
            samples = []
            for _ in range(3):
                t0 = time.time()
                fn(df).agg(F.count(F.lit(1))).collect()
                samples.append(time.time() - t0)
            row[corpus] = round(sorted(samples)[1], 3)
        row["skew_ratio"] = round(row["planted_99_hot"]
                                  / max(row["real_sf1"], 1e-9), 3)
        out["shapes"][name] = row
        print(f"[skew] {name}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
