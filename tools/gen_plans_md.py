"""Regenerate PLANS.md's audit table (everything from the '| query |'
header down) from a live plan audit of all queries() entries at sf0.001.
The prose header above the table is preserved. Run at round end after the
operator changes settle.

Usage: python tools/gen_plans_md.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLE_HEADER = ("| query | exchanges | joins | python | "
                "scans (pruned columns per parquet scan) |")


def main() -> None:
    from relationaldecomposition_spark.plans.audit import (
        PlanAudit, audit_registered_queries)
    from relationaldecomposition_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("gen_plans_md")
    audits = audit_registered_queries(spark, sf_dir)
    spark.stop()

    lines = [TABLE_HEADER, "|---|---|---|---|---|"]
    errors = []
    for name, a in audits.items():
        if not isinstance(a, PlanAudit):
            errors.append((name, a))
            lines.append(f"| {name} | ERROR | - | - | `{a}` |")
            continue
        joins = "+".join(sorted(set(a.join_strategies))) or "-"
        python = ("PYTHON-UDF" if a.has_python_udf
                  else "arrow" if a.has_arrow_pandas else "-")
        scans = ", ".join(f"`{'|'.join(s)}`" for s in a.read_schemas) \
            or "`-`"
        lines.append(f"| {name} | {a.exchanges} | {joins} | {python} "
                     f"| {scans} |")
    lines.append("")

    path = os.path.join(REPO, "PLANS.md")
    with open(path) as f:
        text = f.read()
    cut = text.index(TABLE_HEADER)
    with open(path, "w") as f:
        f.write(text[:cut] + "\n".join(lines))
    n_udf = sum(1 for a in audits.values()
                if isinstance(a, PlanAudit) and a.has_python_udf)
    print(f"rewrote {len(audits)} rows; row-at-a-time PYTHON-UDF count: "
          f"{n_udf}; errors: {len(errors)}")
    for name, e in errors:
        print(f"  ERROR {name}: {e}")


if __name__ == "__main__":
    main()
