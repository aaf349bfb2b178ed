"""Mining vs brute force (the reference's own oracle pattern:
Main.singleDatasetTest diffs mineMVDs against bruteForce)."""

import random

import pytest

from relationaldecomposition_spark.core.deps import FD, MVD, DependencySet
from relationaldecomposition_spark.engine.entropy import SparkEntropyEngine
from relationaldecomposition_spark.engine.measures import MeasureEngine
from relationaldecomposition_spark.mining.lattice import (
    MVDMiner, TopDownSearch, rhs_partitions)


@pytest.fixture(scope="module")
def planted4(spark):
    """4 columns: k determines a; c independent of (a,b) given k."""
    rng = random.Random(7)
    rows = []
    for k in range(1, 13):
        a = k % 3
        bs = rng.sample(range(10), 2)
        cs = rng.sample(range(10), 2)
        for b in bs:
            for c in cs:
                rows.append((k, a, b, c))
    df = spark.createDataFrame(rows, ["k", "a", "b", "c"])
    return df


@pytest.fixture(scope="module")
def meng4(planted4):
    return MeasureEngine(SparkEntropyEngine(planted4))


def test_rhs_partitions_counts():
    schema = ["a", "b", "c", "d", "e"]
    # |R-X| = m -> 2^(m-1)-1 partitions
    assert len(list(rhs_partitions(frozenset(), schema))) == 15
    assert len(list(rhs_partitions(frozenset(["a"]), schema))) == 7
    assert len(list(rhs_partitions(frozenset(schema[:-1]), schema))) == 0
    # each partition counted once: Y and its complement never both emitted
    parts = list(rhs_partitions(frozenset(["a"]), schema))
    rest = frozenset(["b", "c", "d", "e"])
    for y in parts:
        assert rest - y not in parts or rest - y == y


def test_fd_topdown_finds_planted(meng4):
    search = TopDownSearch(meng4, FD, alpha=0.0)
    found = search.search()
    # k -> a planted; every discovered FD must actually hold
    assert any(d.lhs == frozenset(["k"]) and d.rhs == frozenset(["a"])
               for d in found)
    for d in found:
        assert meng4.fd_measure(d.lhs, d.rhs) <= 1e-9, str(d)


def test_fd_search_minimality(meng4):
    # top-down returns most-general holding deps: no discovered lhs is a
    # strict superset of another discovered lhs with the same rhs
    found = list(TopDownSearch(meng4, FD, alpha=0.0).search())
    for d1 in found:
        for d2 in found:
            if d1 is not d2 and d1.rhs == d2.rhs:
                assert not (d1.lhs < d2.lhs)


def test_mvd_topdown_finds_planted(meng4):
    search = TopDownSearch(meng4, MVD, alpha=0.0)
    found = search.search()
    assert any(d.lhs == frozenset(["k"]) and d.rhs == frozenset(["c"])
               for d in found), [str(d) for d in found]
    for d in found:
        assert meng4.mvd_measure(d.lhs, d.rhs) <= 1e-9, str(d)


def test_mine_mvds_vs_brute_force(meng4):
    miner = MVDMiner(meng4, alpha=0.0)
    mined = miner.mine()
    brute = MVDMiner(meng4, alpha=0.0).brute_force()
    brute_keys = {(d.lhs, d.rhs) for d in brute}
    # soundness: everything mined holds (is in the brute-force set)
    for d in mined:
        assert (d.lhs, d.rhs) in brute_keys, f"false positive {d}"
    # the planted MVD k ->> c must be mined (possibly canonicalized as its
    # complement block k ->> {a,b} — the same two-block partition)
    assert any(d.lhs == frozenset(["k"])
               and d.rhs in (frozenset(["c"]), frozenset(["a", "b"]))
               for d in mined), [str(d) for d in mined]


def test_lattice_inference_bound():
    from relationaldecomposition_spark.core.deps import Measure
    from relationaldecomposition_spark.mining.lattice import LatticeOrderingInference
    disc = DependencySet()
    held = FD(frozenset(["k"]), frozenset(["a"]))
    held.measure.set_value(0.0)
    disc.add(held)
    inf = LatticeOrderingInference(disc, alpha=0.0)
    child = FD(frozenset(["k", "b"]), frozenset(["a"]))
    assert inf.implies(child)  # superset lhs, same rhs => implied
    other = FD(frozenset(["b"]), frozenset(["a"]))
    assert not inf.implies(other)


def test_print_lattice_levels():
    """Reference parity (Main.printLattice): level-wise most-general-first
    dump, FDs specialize by growing the LHS, terminating when the LHS is
    full; per-level dedup."""
    import io

    from relationaldecomposition_spark.core.deps import FD, print_lattice

    buf = io.StringIO()
    print_lattice(["a", "b", "c"], FD, buf)
    lines = buf.getvalue().splitlines()
    levels, counts = [], {}
    for ln in lines:
        if ln.startswith("Level"):
            levels.append(ln)
            counts[len(levels)] = 0
        else:
            counts[len(levels)] += 1
    # 3 attrs: empty-LHS singles, 1-LHS (3*2), 2-LHS (3)
    assert counts == {1: 3, 2: 6, 3: 3}
