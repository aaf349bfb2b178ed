"""Shared-subtree duplication audit over optimized logical plans.

The measured law (rounds 12-13, six instances): Spark has no automatic
logical-subtree reuse — a groupBy+join-back, a self-join, or a
union-of-two-derivations of the same frame evaluates the shared upstream
subtree once PER CONSUMER, and when that subtree is expensive
(scan + md5 + explode + agg) the duplicate evaluation dominates wall time
at scale. Every instance so far was found by hand-profiling one query;
this module computes the same signal statically for every registered
query at once: walk the optimized logical plan, fingerprint each subtree
with a canonical digest (operator head with expression-ids stripped +
children digests), and report every non-leaf subtree that occurs >= 2
times within one plan, with a cost class (does the duplicated work carry
a scan / shuffle-bearing operator, or is it a cheap map-only shape?).

Interpretation notes, measured not guessed:
- A duplicate whose subtree is map-only over a broadcast-side frame is
  usually fine (line_dedup's counter-example, NOTES_r12): re-evaluating
  a cheap projection beats materializing it.
- Physical exchange reuse (ReuseExchange / AQE stage reuse) can de-dup
  *identical shuffles*, but NOT shared work that feeds two consumers
  with different downstream keys — which is exactly the shape the law
  targets. The physical `ReusedExchange` count is recorded per query as
  a hint, but a logical duplicate is not excused by it unless measured.
- Fixed instances disappear from this report automatically: a
  localCheckpoint replaces the shared subtree with a LogicalRDD leaf.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# exprIds (`#123`, `#123L`) differ between the two sides of a self-join
# and between separately-built copies of the same derivation; strip them
# so semantically-identical subtrees hash together.
_EXPR_ID = re.compile(r"#\d+L?")
# cast ids inside generated aliases like `_groupingexpression#12`
_FRESH_NAME = re.compile(r"_(?:groupingexpression|w|we|common_expr)\d+")

# Operator classes whose presence in a duplicated subtree makes the
# duplicate expensive. Shuffle-bearing logical nodes:
_SHUFFLE_NODES = {
    "Aggregate", "Join", "Window", "Sort", "Distinct", "Deduplicate",
    "Repartition", "RepartitionByExpression", "Intersect", "Except",
    "CoGroup", "FlatMapGroupsInPandas", "FlatMapGroupsInArrow",
}
# Leaf relations (parquet scans / in-memory) — duplicated scans are the
# scan-cost half of the law:
_SCAN_NODES = {"LogicalRelation", "Relation", "HiveTableRelation"}
# Already-materialized leaves — a checkpointed frame read twice is the
# FIX for the law, not an instance of it:
_MATERIALIZED_NODES = {"LogicalRDD", "InMemoryRelation"}


@dataclass
class DupSubtree:
    """One maximal duplicated subtree within a single query plan."""

    digest: str
    node_name: str
    head: str            # normalized one-line head of the subtree root
    count: int           # occurrences in this plan
    n_nodes: int         # size of one instance
    has_shuffle: bool
    has_scan: bool
    shuffle_ops: list[str] = field(default_factory=list)

    @property
    def cost_class(self) -> str:
        if self.has_shuffle and self.has_scan:
            return "scan+shuffle"
        if self.has_shuffle:
            return "shuffle"
        if self.has_scan:
            return "scan"
        return "cheap"

    @property
    def expensive(self) -> bool:
        return self.has_shuffle


@dataclass
class SubtreeAudit:
    """Whole-plan duplication report for one query."""

    dups: list[DupSubtree] = field(default_factory=list)
    n_nodes: int = 0
    reused_exchanges: int = 0   # physical-plan hint, see module docstring

    @property
    def expensive_dups(self) -> list[DupSubtree]:
        return [d for d in self.dups if d.expensive]


def _children(jnode) -> list:
    seq = jnode.children()
    return [seq.apply(i) for i in range(seq.size())]


def _norm_head(jnode) -> str:
    head = jnode.simpleString(25)
    head = _EXPR_ID.sub("#", head)
    head = _FRESH_NAME.sub("_fresh", head)
    return head


class _Walker:
    """One JVM pass builds a Python-side mirror tree (digest + children);
    the maximal-dup report then runs entirely Python-side — py4j calls
    stay O(plan size), not O(size^2)."""

    def __init__(self) -> None:
        self.counts: dict[str, int] = {}
        self.info: dict[str, dict] = {}
        self.n_nodes = 0

    def digest(self, jnode) -> dict:
        """Returns the mirror node {"d": digest, "kids": [mirror...]}"""
        self.n_nodes += 1
        name = jnode.nodeName()
        kids = [self.digest(k) for k in _children(jnode)]
        kid_digests = [k["d"] for k in kids]
        head = _norm_head(jnode)
        d = hashlib.md5(
            ("\x00".join([name, head] + kid_digests)).encode()
        ).hexdigest()
        if d not in self.info:
            sub = [self.info[k] for k in kid_digests]
            self.info[d] = {
                "name": name,
                "head": head[:160],
                "n_leaf_children": len(kids),
                "n_nodes": 1 + sum(s["n_nodes"] for s in sub),
                "shuffle_ops": sorted(
                    ({name} if name in _SHUFFLE_NODES else set()).union(
                        *[set(s["shuffle_ops"]) for s in sub] or [set()])),
                "has_scan": (name in _SCAN_NODES) or any(
                    s["has_scan"] for s in sub),
                "materialized": name in _MATERIALIZED_NODES,
            }
        self.counts[d] = self.counts.get(d, 0) + 1
        return {"d": d, "kids": kids}

    def report(self, mirror: dict) -> list[DupSubtree]:
        """Top-down: emit a dup at its highest (maximal) occurrence and do
        not descend into it — nested sub-dups are implied."""
        out: dict[str, DupSubtree] = {}
        stack = [mirror]
        while stack:
            node = stack.pop()
            d = node["d"]
            inf = self.info[d]
            if (self.counts[d] >= 2 and inf["n_leaf_children"] > 0
                    and not inf["materialized"]):
                if d not in out:
                    out[d] = DupSubtree(
                        digest=d, node_name=inf["name"], head=inf["head"],
                        count=self.counts[d], n_nodes=inf["n_nodes"],
                        has_shuffle=bool(inf["shuffle_ops"]),
                        has_scan=inf["has_scan"],
                        shuffle_ops=list(inf["shuffle_ops"]))
                continue  # maximal: don't descend
            stack.extend(node["kids"])
        return sorted(out.values(),
                      key=lambda x: (-int(x.expensive), -x.n_nodes))


def audit_subtrees(df: DataFrame, physical_hint: bool = True) -> SubtreeAudit:
    qe = df._jdf.queryExecution()
    plan = qe.optimizedPlan()
    w = _Walker()
    mirror = w.digest(plan)
    dups = w.report(mirror)
    reused = 0
    if physical_hint:
        try:
            reused = qe.executedPlan().toString().count("ReusedExchange")
        except Exception:  # noqa: BLE001 - hint only
            reused = -1
    return SubtreeAudit(dups=dups, n_nodes=w.n_nodes,
                        reused_exchanges=reused)


def audit_registered_subtrees(
        spark, sf_dir: str = "/root/testdata/sf0.001",
        names=None) -> dict[str, "SubtreeAudit | Exception"]:
    """Duplication-audit every queries() entry (plans only, no execution)."""
    from ..queries import QUERIES

    out: dict[str, SubtreeAudit | Exception] = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            out[name] = audit_subtrees(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - report and continue
            out[name] = e
    return out
