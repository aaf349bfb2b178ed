"""Physical-plan auditing: the evidence layer for scale claims.

Extracts the properties that matter at 100 TB from a DataFrame's executed
plan — scanned columns, pushed filters, join strategies, Python boundaries —
and can sweep every registered driver query to produce a plan-quality
report. Used by tests/test_plans.py and by `python -m
relationaldecomposition_spark.plans.audit` for a human-readable dump.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    read_schemas: list[list[str]] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    join_strategies: list[str] = field(default_factory=list)
    has_python_udf: bool = False
    has_arrow_pandas: bool = False
    exchanges: int = 0

    @property
    def summary(self) -> str:
        return (f"scans={['|'.join(s) for s in self.read_schemas]} "
                f"filters={self.pushed_filters} joins={self.join_strategies} "
                f"exchanges={self.exchanges} "
                f"python_udf={self.has_python_udf} arrow={self.has_arrow_pandas}")


def audit(df: DataFrame) -> PlanAudit:
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = PlanAudit()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        out.read_schemas.append(
            [c.split(":")[0] for c in m.group(1).split(",") if c])
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.pushed_filters.append(m.group(1))
    for strat in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                  "BroadcastNestedLoopJoin", "CartesianProduct"):
        out.join_strategies += [strat] * plan.count(strat)
    out.has_python_udf = "BatchEvalPython" in plan
    out.has_arrow_pandas = ("ArrowEvalPython" in plan or "MapInPandas" in plan
                            or "FlatMapGroupsInPandas" in plan)
    out.exchanges = plan.count("Exchange")
    return out


def audit_registered_queries(spark, sf_dir: str = "/root/testdata/sf0.001",
                             names=None) -> dict[str, PlanAudit]:
    """Plan-audit every queries() entry without executing it (plans only)."""
    from ..queries import QUERIES

    out = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            out[name] = audit(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - report and continue
            out[name] = e
    return out


if __name__ == "__main__":
    import sys

    from ..session import get_spark

    spark = get_spark("plan_audit")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    for name, a in audit_registered_queries(spark, sf_dir).items():
        print(f"{name}: {a.summary if isinstance(a, PlanAudit) else f'ERROR {a}'}")
    spark.stop()
