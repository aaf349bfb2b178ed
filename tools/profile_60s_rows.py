"""Per-component accounting for the most expensive sf10 bench rows:
sketch_distinct and bloom_semi (round-9 ask #5) plus remove_dup_spans
(round-11 ask #7 — the 0.49-exponent cluster). The plans are the
intended ones — this decomposes the CONSTANT: scan vs portable-md5 hash
vs sketch/build vs merge/probe vs window stages, warmed-solo (same-query
sf0.1 warm-up in-process, then median-of-3 at the target sf). The rds
section also A/Bs the lead-window shingle stage against a map-only
array-expression equivalent (no per-token shuffle).

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_60s_rows.py [sf_dir]
Prints one JSON line per component.
"""
from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from bench import _force  # noqa: E402
from relationaldecomposition_spark.operators import sketches  # noqa: E402
from relationaldecomposition_spark.operators.bloom import (  # noqa: E402
    bloom_build, bloom_semi_join)
from relationaldecomposition_spark.session import get_spark  # noqa: E402
from relationaldecomposition_spark.sources.tables import (  # noqa: E402
    load_table)


def timed(fn, repeats=1):
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def components(spark, sf_dir, repeats=1):
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    out = {}

    # --- sketch_distinct components ---
    two_cols = li.select("l_returnflag", "l_orderkey")
    out["sketch.scan_2cols"] = timed(lambda: _force(two_cols), repeats)
    hashed = li.select("l_returnflag",
                       sketches._hash64(F.col("l_orderkey")).alias("_h"))
    out["sketch.scan_plus_md5"] = timed(lambda: _force(hashed), repeats)
    out["sketch.kmv_full"] = timed(lambda: _force(
        sketches.kmv_distinct(li, ["l_returnflag"], "l_orderkey", 256)),
        repeats)
    out["sketch.hll_full"] = timed(lambda: _force(
        sketches.hll_distinct(li, ["l_returnflag"], "l_orderkey", 8)),
        repeats)

    # --- bloom_semi components ---
    small = od.where("o_orderpriority = '1-URGENT'").select("o_orderkey")
    out["bloom.build_keys"] = timed(lambda: small.count(), repeats)
    out["bloom.build_full"] = timed(
        lambda: bloom_build(small, "o_orderkey",
                            m_bits=_auto_bits(small.count())), repeats)
    probe_hash = li.select(
        F.expr("CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 15)"
               ", 16, 10) AS BIGINT)").alias("h"))
    out["bloom.probe_scan_md5"] = timed(lambda: _force(probe_hash), repeats)
    out["bloom.semi_full"] = timed(lambda: _force(
        bloom_semi_join(li, "l_orderkey", small, "o_orderkey")), repeats)

    # --- remove_dup_spans components (round-11 ask #7) ---
    from pyspark.sql import Window

    from relationaldecomposition_spark.functions.hashing import (
        portable_hash64)
    from relationaldecomposition_spark.operators.dedup import (
        remove_duplicate_spans, tokens)

    docs = load_table(spark, sf_dir, "documents")
    k = 8
    ex = docs.select(F.col("doc_id"),
                     F.posexplode_outer(tokens(F.col("text")))
                      .alias("_pos", "_tok"))
    out["rds.scan_explode_tokens"] = timed(lambda: _force(ex), repeats)
    w = Window.partitionBy("doc_id").orderBy("_pos")
    leads = [F.lead("_tok", j).over(w) for j in range(1, k)]
    sh = F.when(leads[-1].isNotNull(),
                F.concat_ws(" ", F.col("_tok"), *leads))
    occ_win = (ex.select("doc_id", "_pos", sh.alias("_sh"))
               .where(F.col("_sh").isNotNull())
               .select("doc_id", "_pos",
                       portable_hash64(F.col("_sh")).alias("_h")))
    out["rds.shingles_leadwindow"] = timed(lambda: _force(occ_win),
                                           repeats)
    # map-only alternative: shingles from one array expression per doc,
    # then a single posexplode — no per-token shuffle/sort
    toks = tokens(F.col("text"))
    shingle_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - F.lit(k),
                                        F.lit(-1))),
        lambda i: portable_hash64(
            F.concat_ws(" ", F.slice(toks, i + 1, k))))
    occ_arr = (docs.select("doc_id", F.posexplode_outer(shingle_arr)
                           .alias("_pos", "_h"))
               .where(F.col("_h").isNotNull()))
    out["rds.shingles_arrayexpr"] = timed(lambda: _force(occ_arr), repeats)
    hot = (occ_win.groupBy("_h").agg(F.count(F.lit(1)).alias("_n"))
           .where(F.col("_n") >= 2).select("_h"))
    out["rds.hot_counts"] = timed(lambda: _force(hot), repeats)
    starts = occ_win.join(hot, "_h", "left_semi")
    out["rds.starts_semijoin"] = timed(lambda: _force(starts), repeats)
    ev = (starts.select(
              F.col("doc_id"),
              F.explode(F.array(
                  F.struct(F.col("_pos").alias("_p"), F.lit(1).alias("_d")),
                  F.struct((F.col("_pos") + F.lit(k)).alias("_p"),
                           F.lit(-1).alias("_d")))).alias("_e"))
          .select("doc_id", F.col("_e._p").alias("_p"),
                  F.col("_e._d").alias("_d"),
                  F.lit(None).cast("string").alias("_tok")))
    tokr = (ex.where(F.col("_tok").isNotNull())
            .select("doc_id", F.col("_pos").alias("_p"),
                    F.lit(0).alias("_d"), F.col("_tok")))
    w2 = (Window.partitionBy("doc_id")
          .orderBy("_p", F.when(F.col("_d") == 0, 1).otherwise(0))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (ev.unionByName(tokr).withColumn("_cov", F.sum("_d").over(w2))
           .where(F.col("_d") == 0)
           .select("doc_id", "_p", "_tok",
                   (F.col("_cov") > 0).alias("_c")))
    out["rds.coverage_window"] = timed(lambda: _force(cum), repeats)
    per = (cum.groupBy("doc_id")
           .agg(F.concat_ws(" ", F.transform(
                    F.array_sort(F.collect_list(
                        F.when(~F.col("_c"),
                               F.struct(F.col("_p").alias("p"),
                                        F.col("_tok").alias("t"))))),
                    lambda x: x["t"])).alias("text"),
                F.count(F.lit(1)).alias("n_tokens"),
                F.sum(F.col("_c").cast("long")).alias("n_removed")))
    out["rds.reassembly"] = timed(lambda: _force(per), repeats)
    out["rds.full"] = timed(lambda: _force(
        remove_duplicate_spans(docs, "text", "doc_id", shingle_k=k)),
        repeats)
    return out


def _auto_bits(n_keys):
    from relationaldecomposition_spark.operators.bloom import (
        BLOOM_BITS_PER_KEY, BLOOM_MIN_BITS, WORD_BITS)
    bits = max(BLOOM_MIN_BITS, n_keys * BLOOM_BITS_PER_KEY)
    return ((bits + WORD_BITS - 1) // WORD_BITS) * WORD_BITS


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".data/sf10"
    spark = get_spark("profile60")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM on sf0.1 first (playbook: fresh-JVM first-compilation
    # charges 10-55 s to big pipelines)
    components(spark, "/root/testdata/sf0.1")
    out = components(spark, sf_dir)
    print(json.dumps({"sf_dir": sf_dir, "components": out}))


if __name__ == "__main__":
    main()
