"""Lattice search for approximate FDs and MVDs (driver plane).

Python re-implementation of the search semantics of
`search/TopDownInductiveSearch.java:20-301` (B1), the candidate generators in
`common/dependency/{Functional,Multivalued}Dependency.java` (B2, already on
the dataclasses), the bottom-up `mineMVDs` miner with parent-pair pruning
(B3, `TopDownInductiveSearch.java:207-301`), the brute-force oracle (B4,
`:177-194`), and the RHS-partition candidate generator (B5,
`search/CandidateGenerator.java:24-125`).

The one structural change vs. the reference: every "measure this set of
candidates" step goes through ``MeasureEngine.measure_all``, which collects
all entropy subsets a level needs and fetches them in chunked grouping-sets
Spark jobs (A8) — the reference instead issues one full file scan per
uncached entropy. Search logic itself is pure driver-side Python.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from ..core.deps import FD, MVD, Dependency, DependencySet, Status
from ..engine.measures import MeasureEngine


class LatticeOrderingInference:
    """Weak inference bound (`inference/LatticeOrderingInference.java:10-48`):
    if X' -> Y (same rhs) is discovered with X' ⊆ X, then mu(X -> Y) <=
    mu(X' -> Y) — specializing the lhs never increases the measure."""

    def __init__(self, discovered: DependencySet, alpha: float):
        self.discovered = discovered
        self.alpha = alpha

    def infer(self, dep: Dependency) -> None:
        for disc in self.discovered.with_rhs(dep.rhs):
            if disc.lhs <= dep.lhs:
                dep.measure.update_upper(disc.measure.upper)
                break

    def implies(self, dep: Dependency) -> bool:
        self.infer(dep)
        return dep.measure.is_less_than(self.alpha) is Status.TRUE


def rhs_partitions(lhs: frozenset[str], schema: Sequence[str]) -> Iterator[frozenset[str]]:
    """B5: for fixed lhs X, the 2^(|R-X|-1)-1 distinct two-block partitions
    {Y, Z} of R-X, emitted as the block not containing the last non-lhs
    attribute (CandidateGenerator's counter over the first m-1 attributes)."""
    non_lhs = [c for c in schema if c not in lhs]
    m = len(non_lhs)
    if m < 2:
        return
    for mask in range(1, 1 << (m - 1)):
        yield frozenset(non_lhs[j] for j in range(m - 1) if (mask >> j) & 1)


class TopDownSearch:
    """B1: BFS from most-general dependencies; per level, batch-measure the
    queue, keep mu <= alpha as discovered, specialize the rest (skipping
    specializations the lattice-order bound already implies)."""

    def __init__(self, meng: MeasureEngine, dep_cls: type, alpha: float,
                 stop_flag=None):
        assert dep_cls in (FD, MVD)
        self.meng = meng
        self.dep_cls = dep_cls
        self.alpha = alpha
        self.schema = list(meng.schema_cols)
        self.discovered = DependencySet()
        self.inference = LatticeOrderingInference(self.discovered, alpha)
        self.inferred_count = 0
        self.levels_run = 0
        # cooperative stop (TimeoutRunner contract, like JDMiner._stop):
        # polled once per lattice level, BEFORE the level's Spark jobs
        # launch; also installed in the entropy engine so a long chunked
        # measure batch stops mid-batch (one chunk of latency)
        self._stop = stop_flag or (lambda: False)
        if stop_flag is not None:
            meng.engine.stop_check = stop_flag

    def search(self) -> DependencySet:
        queue = DependencySet(self.dep_cls.most_general(self.schema))
        while queue and not self._stop():
            self.levels_run += 1
            unknown = [d for d in queue if not d.measure.is_exact]
            if unknown:
                self.meng.measure_all(unknown)
            specialize: list[Dependency] = []
            for dep in queue:
                if dep.measure.upper <= self.alpha:
                    self.discovered.add(dep)
                else:
                    specialize.append(dep)
            queue = DependencySet()
            for parent in specialize:
                for child in parent.specializations(self.schema):
                    if self.inference.implies(child):
                        self.inferred_count += 1
                    else:
                        queue.add(child)
        return self.discovered


class MVDMiner:
    """B3/B4: bottom-up MVD mining from saturated dependencies, plus the
    brute-force oracle."""

    def __init__(self, meng: MeasureEngine, alpha: float, stop_flag=None):
        self.meng = meng
        self.alpha = alpha
        self.schema = list(meng.schema_cols)
        self.discovered = DependencySet()
        self.border: DependencySet = DependencySet()
        # cooperative stop (TimeoutRunner contract): a timed-out worker
        # thread survives cancelJobGroup (only in-flight jobs die), so the
        # miner must stop LAUNCHING jobs too — polled at every level,
        # before every measure_all batch, and (via the engine hook) between
        # the chunked grouping-sets jobs inside a batch
        self._stop = stop_flag or (lambda: False)
        if stop_flag is not None:
            meng.engine.stop_check = stop_flag

    def _accurate(self, deps: list) -> list:
        """getAccurate (TopDownInductiveSearch.java:195-205), batched."""
        self.meng.measure_all(deps)
        return [d for d in deps if d.measure.value <= self.alpha]

    def mine(self) -> DependencySet:
        """mineMVDs (TopDownInductiveSearch.java:207-262): seed with accurate
        most-specific MVDs + saturated FDs, then shrink determinants
        level-by-level, pruning candidates the previous level refutes."""
        schema = self.schema
        n = len(schema)
        q = DependencySet(self._accurate(MVD.most_specific(schema)))
        for fd in self._accurate(FD.most_specific(schema)):
            self.discovered.add(fd)
        for mvd in q:
            self.discovered.add(mvd)

        processed: set[frozenset[str]] = set()
        for k in range(n - 3, -1, -1):
            if self._stop():
                break
            found = False
            p = DependencySet()
            determinants = {d.lhs for d in q}
            for det in determinants:
                if self._stop():
                    break
                det_sorted = [c for c in schema if c in det]
                # drop each of the first k+1 attributes of the determinant
                for i in range(1, min(k + 1, len(det_sorted)) + 1):
                    new_det = det - {det_sorted[i - 1]}
                    if new_det in processed:
                        continue
                    processed.add(new_det)
                    candidates = [MVD(new_det, rhs)
                                  for rhs in rhs_partitions(new_det, schema)]
                    to_measure = [c for c in candidates if not self._prune(c, q)]
                    if not to_measure:
                        continue
                    if self._stop():
                        break
                    self.meng.measure_all(to_measure)
                    for c in to_measure:
                        if c.measure.value <= self.alpha:
                            p.add(c)
                            self.discovered.add(c)
                            found = True
            if not found:
                break
            q = p
        self.border = q
        return self.discovered

    def _prune(self, cand: MVD, prev: DependencySet) -> bool:
        """Parent-pair prune (TopDownInductiveSearch.prune:264-301): a
        candidate X ->> Y (with Z = R-XY) survives only if for every v we
        could move back into the determinant, the previous level held one of
        the two parents (Xv ->> Y-v) or (Xv ->> Z) — else prune."""
        full = frozenset(self.schema)
        x, y = cand.lhs, cand.rhs
        z = full - x - y
        if not z:
            z = y  # saturated-FD hack (reference :272-274)
        if len(y) > 1:
            for v in y:
                lhs2 = x | {v}
                if not (prev.contains_lr(lhs2, y - {v}) or prev.contains_lr(lhs2, z)):
                    return True
        if len(z) > 1:
            for v in z:
                lhs2 = x | {v}
                if not (prev.contains_lr(lhs2, z - {v}) or prev.contains_lr(lhs2, y)):
                    return True
        return False

    def brute_force(self) -> DependencySet:
        """B4: measure every MVD candidate (every lhs except R, every RHS
        partition) + saturated FDs; keep mu <= alpha
        (TopDownInductiveSearch.bruteForce:177-194)."""
        from itertools import combinations

        schema = self.schema
        cands: list = []
        for r in range(0, len(schema)):
            for det in combinations(schema, r):
                lhs = frozenset(det)
                cands.extend(MVD(lhs, rhs) for rhs in rhs_partitions(lhs, schema))
        cands.extend(FD.most_specific(schema))
        out = DependencySet()
        # chunk to keep each measure_all's subset collection bounded
        for i in range(0, len(cands), 256):
            for d in self._accurate(cands[i:i + 256]):
                out.add(d)
        return out
