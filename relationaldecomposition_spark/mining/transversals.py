"""Incremental minimal-hypergraph-transversal enumeration.

Python re-implementation of `common/Transversals.java:11-101`: maintain the
set of minimal transversals of a growing hypergraph; adding a hyperedge
invalidates transversals that miss it and extends each with every vertex of
the new edge, keeping only minimal results. Driver-side only — hypergraphs
here have <= #attributes vertices.
"""

from __future__ import annotations

from collections.abc import Iterable


class Transversals:
    """Iterator over minimal transversals, supporting addHyperedge between
    pulls (the mine-all-min-seps loop adds each newly found separator as an
    edge and resumes)."""

    def __init__(self, hyperedges: Iterable[frozenset[str]] = ()):
        self.hyperedges: set[frozenset[str]] = set()
        self.generated: set[frozenset[str]] = {frozenset()}
        self.returned: set[frozenset[str]] = set()
        for e in hyperedges:
            self.add_hyperedge(frozenset(e))

    def add_hyperedge(self, edge: frozenset[str]) -> None:
        edge = frozenset(edge)
        if edge in self.hyperedges:
            return
        self.hyperedges.add(edge)
        dead_gen = {t for t in self.generated if not (t & edge)}
        dead_ret = {t for t in self.returned if not (t & edge)}
        self.generated -= dead_gen
        self.returned -= dead_ret
        for t in dead_gen | dead_ret:
            for v in edge:
                cand = t | {v}
                if self._is_minimal(cand):
                    self.generated.add(cand)

    def _is_minimal(self, t: frozenset[str]) -> bool:
        # not minimal if it contains (or equals) any live transversal
        return not any(cur <= t for cur in self.generated) and \
            not any(cur <= t for cur in self.returned)

    def __iter__(self):
        return self

    def __next__(self) -> frozenset[str]:
        if not self.generated:
            raise StopIteration
        # deterministic pull order: smallest first, then lexicographic
        t = min(self.generated, key=lambda s: (len(s), sorted(s)))
        self.generated.discard(t)
        self.returned.add(t)
        return t

    def has_next(self) -> bool:
        return bool(self.generated)
