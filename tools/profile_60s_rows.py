"""Per-component accounting for the two 60 s-class sf10 bench rows
(round-9 ask #5): sketch_distinct and bloom_semi. Both plans are the
intended ones — this decomposes the CONSTANT: scan vs portable-md5 hash
vs sketch/build vs merge/probe, warmed-solo (same-query sf0.1 warm-up
in-process, then median-of-3 at the target sf).

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
