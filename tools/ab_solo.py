"""Solo A/B bench runner: median-of-N for a named query subset with the
calibration row, in ONE subprocess-fresh Spark session, printing one JSON
line. Run alternately from two worktrees to adjudicate a cross-round raw
uptick (the cosine_topk protocol from NOTES_r12 ask #3).

Usage: python tools/ab_solo.py q1 [q2 ...]   (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_BENCH_REPEATS, SPARK_GRAFT_CPUS)
"""
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from relationaldecomposition_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    spark = get_spark("ab_solo")
    out = bench.run_bench(spark, sf_dir, repeats=repeats, only=names)
    spark.stop()
    out["_repo"] = repo
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
