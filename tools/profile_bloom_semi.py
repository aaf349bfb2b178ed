"""Profile the bloom_semi bench row component-by-component (r14 verdict
ask #5): the build/probe split per guide §3.2 — auto-size count job,
bitmap build job, map-only probe — plus the bloom_semi_bc broadcast face.

Usage: python tools/profile_bloom_semi.py [reps]
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

from pyspark.sql import functions as F  # noqa: E402

from relationaldecomposition_spark.operators.bloom import (  # noqa: E402
    BLOOM_BITS_PER_KEY, BLOOM_MIN_BITS, WORD_BITS, bloom_build,
    bloom_probe_broadcast, bloom_probe_expr, bloom_semi_join)
from relationaldecomposition_spark.session import get_spark  # noqa: E402
from relationaldecomposition_spark.sources.tables import load_table  # noqa: E402

from bench import _force  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_bloom")
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    li.count()  # warm footers

    out: dict = {}

    def t(name, fn, n=reps):
        samples = []
        for _ in range(n):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        out[name] = {"median": round(statistics.median(samples), 3),
                     "raw": [round(s, 3) for s in samples]}
        print(name, out[name]["median"], flush=True)

    small = od.where("o_orderpriority = '1-URGENT'").select("o_orderkey")

    # components of the bench bloom_semi row
    t("count_job", lambda: small.where(F.col("o_orderkey").isNotNull())
        .count())
    n = small.where(F.col("o_orderkey").isNotNull()).count()
    m_bits = max(BLOOM_MIN_BITS,
                 -(-(n * BLOOM_BITS_PER_KEY) // WORD_BITS) * WORD_BITS)
    out["n_keys"] = n
    out["m_bits"] = m_bits
    t("build_job", lambda: bloom_build(small, "o_orderkey", m_bits))
    words = bloom_build(small, "o_orderkey", m_bits)
    t("probe_literal", lambda: _force(
        li.where(F.col("l_orderkey").isNotNull()
                 & bloom_probe_expr("l_orderkey", words))))
    t("probe_broadcast", lambda: _force(
        li.where(F.col("l_orderkey").isNotNull()
                 & bloom_probe_broadcast(li, "l_orderkey", words))))
    # the full rows as the bench times them
    t("bloom_semi_full", lambda: _force(
        bloom_semi_join(li, "l_orderkey", small, "o_orderkey")))
    t("bloom_semi_bc_full", lambda: _force(
        bloom_semi_join(li, "l_orderkey", od.select("o_orderkey"),
                        "o_orderkey", literal_max_bits=0)))
    # plan-construction-only cost of the literal probe (driver-side):
    t("probe_literal_plan_only", lambda: li.where(
        F.col("l_orderkey").isNotNull()
        & bloom_probe_expr("l_orderkey", words)).schema)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
