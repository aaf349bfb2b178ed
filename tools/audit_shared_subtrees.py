"""Sweep every registered driver query for duplicated logical subtrees
(the shared-subtree law, rounds 12-13 — see plans/subtree.py) and write
the report to SCALING.json under `shared_subtree_audit_r{N}`.

Usage: python tools/audit_shared_subtrees.py [sf_dir] [--round N]

Prints one line per flagged query; `EXPENSIVE` rows (duplicate contains a
shuffle-bearing operator) are the law's candidates — each must be either
fixed (lazy localCheckpoint per the NOTES_r13 boundary rule) or
documented as a measured counter-example in the allowlist of
tests/test_shared_subtrees.py.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from relationaldecomposition_spark.plans.subtree import (
        SubtreeAudit, audit_registered_subtrees)
    from relationaldecomposition_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    rnd = 14
    if "--round" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--round") + 1])

    spark = get_spark("audit_shared_subtrees")
    audits = audit_registered_subtrees(spark, sf_dir)
    spark.stop()

    flagged: dict[str, list[dict]] = {}
    errors: dict[str, str] = {}
    n_expensive = 0
    for name, a in audits.items():
        if not isinstance(a, SubtreeAudit):
            errors[name] = str(a)[:200]
            continue
        if not a.dups:
            continue
        rows = []
        for d in a.dups:
            rows.append({
                "node": d.node_name, "count": d.count,
                "n_nodes": d.n_nodes, "cost": d.cost_class,
                "shuffle_ops": d.shuffle_ops, "head": d.head,
            })
            if d.expensive:
                n_expensive += 1
        flagged[name] = rows
        exp = [r for r in rows if r["cost"] in ("shuffle", "scan+shuffle")]
        tag = "EXPENSIVE" if exp else "cheap-only"
        print(f"{name}: {len(rows)} dup subtree(s) [{tag}] "
              f"reused_exchanges={a.reused_exchanges}")
        for r in rows:
            print(f"    x{r['count']} {r['cost']:<13} {r['node']:<12} "
                  f"nodes={r['n_nodes']:<4} ops={r['shuffle_ops']} "
                  f"{r['head'][:90]}")

    summary = {
        "tool": "tools/audit_shared_subtrees.py",
        "sf_dir": sf_dir,
        "queries_audited": len(audits),
        "queries_with_dups": len(flagged),
        "expensive_dup_count": n_expensive,
        "flagged": flagged,
        "errors": errors,
        "note": ("maximal duplicated non-leaf subtrees per optimized "
                 "logical plan; expensive = duplicate carries a "
                 "shuffle-bearing op. Each expensive row is fixed or "
                 "allowlisted-with-measurement in "
                 "tests/test_shared_subtrees.py."),
    }
    path = os.path.join(REPO, "SCALING.json")
    with open(path) as f:
        scaling = json.load(f)
    scaling[f"shared_subtree_audit_r{rnd}"] = summary
    with open(path, "w") as f:
        json.dump(scaling, f, indent=1)
    print(f"\naudited {len(audits)} queries; {len(flagged)} with dups; "
          f"{n_expensive} expensive; {len(errors)} errors -> SCALING.json")
    for n, e in errors.items():
        print(f"  ERROR {n}: {e}")


if __name__ == "__main__":
    main()
