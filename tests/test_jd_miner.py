"""JD mining on planted structure + pure-python unit tests for the
transversal iterator and Beeri inference (SURVEY.md §5 patterns 1-2)."""

import random

import pytest

from relationaldecomposition_spark.core.deps import JD, MVD, DependencySet
from relationaldecomposition_spark.engine.entropy import SparkEntropyEngine
from relationaldecomposition_spark.engine.measures import MeasureEngine
from relationaldecomposition_spark.mining.inference import BeeriInference, DependencyBasis
from relationaldecomposition_spark.mining.jd_miner import JDMiner
from relationaldecomposition_spark.mining.transversals import Transversals


def test_transversals_basic():
    # hyperedges {a,b}, {b,c}: minimal transversals are {b}, {a,c}
    tr = Transversals([frozenset("ab"), frozenset("bc")])
    got = set()
    while tr.has_next():
        got.add(next(tr))
    assert got == {frozenset("b"), frozenset(["a", "c"])}


def test_transversals_incremental():
    tr = Transversals([frozenset("ab")])
    first = set()
    while tr.has_next():
        first.add(next(tr))
    assert first == {frozenset("a"), frozenset("b")}
    # adding edge {c}: every transversal must now also hit {c}
    tr.add_hyperedge(frozenset("c"))
    more = set()
    while tr.has_next():
        more.add(next(tr))
    assert more == {frozenset(["a", "c"]), frozenset(["b", "c"])}


def test_dependency_basis_split_and_infer():
    schema = ["a", "b", "c", "d"]
    # discovered: {a} ->> {b}, exact
    dep = MVD(frozenset("a"), frozenset("b"))
    dep.measure.set_value(0.0)
    basis = DependencyBasis(schema, frozenset("a"))
    basis.compute([dep])
    # basis of {a} must split {b,c,d} into {b} and {c,d}
    assert frozenset("b") in basis.basis
    assert frozenset(["c", "d"]) in basis.basis
    # infer: a ->> {c,d} is implied with bound 0
    target = MVD(frozenset("a"), frozenset(["c", "d"]))
    basis.infer(target)
    assert target.measure.upper == 0.0
    # a ->> {c} alone is NOT a union of basis pieces -> no bound
    target2 = MVD(frozenset("a"), frozenset("c"))
    basis.infer(target2)
    assert target2.measure.upper == float("inf")


def test_beeri_implies():
    schema = ["a", "b", "c", "d"]
    disc = DependencySet()
    d1 = MVD(frozenset("a"), frozenset("b"))
    d1.measure.set_value(0.0)
    disc.add(d1)
    inf = BeeriInference(disc, schema, alpha=0.0)
    assert inf.implies(MVD(frozenset("a"), frozenset(["c", "d"])))
    assert not inf.implies(MVD(frozenset("a"), frozenset("c")))


@pytest.fixture(scope="module")
def planted5(spark):
    """k,a | k,b | k,c: everything independent given k =>
    JD [k | {a},{b},{c}] holds; minimal separator for every pair is {k}."""
    rng = random.Random(11)
    rows = []
    for k in range(1, 9):
        # draw each column's per-k support ONCE so a,b,c are exactly
        # conditionally independent given k (full cross product per k)
        avs = rng.sample(range(6), 2)
        bvs = rng.sample(range(6), 2)
        cvs = rng.sample(range(6), 2)
        for a in avs:
            for b in bvs:
                for c in cvs:
                    rows.append((k, f"a{a}", f"b{b}", f"c{c}"))
    df = spark.createDataFrame(rows, ["k", "a", "b", "c"])
    return df


@pytest.fixture(scope="module")
def miner5(planted5):
    return JDMiner(MeasureEngine(SparkEntropyEngine(planted5)), epsilon=0.0)


def test_consistent_jd_full_split(miner5):
    start = JD.most_specific(frozenset(["k"]), miner5.schema)
    jd = miner5.consistent_jd_candidate(["k"], start)
    # independence given k: nothing merges, all three singleton components stay
    assert jd is not None
    assert jd.components == frozenset(
        [frozenset("a"), frozenset("b"), frozenset("c")])
    assert miner5.jd_measure(jd) <= 1e-9


def test_consistent_jd_merges_correlated(spark):
    # b == c always: they must merge; JD [k | {a}, {b,c}]
    rows = [(k, a, v, v) for k in range(6) for a in range(3) for v in range(4)]
    df = spark.createDataFrame(rows, ["k", "a", "b", "c"])
    miner = JDMiner(MeasureEngine(SparkEntropyEngine(df)), epsilon=0.0)
    jd = miner.consistent_jd_candidate(
        ["k"], JD.most_specific(frozenset(["k"]), miner.schema))
    assert jd is not None
    assert frozenset(["b", "c"]) in jd.components
    # with x=b, y=c they cannot be separated -> None
    jd2 = miner.consistent_jd_candidate(
        ["k"], JD.most_specific(frozenset(["k"]), miner.schema), x="b", y="c")
    assert jd2 is None


def test_mine_jds_with_lhs(miner5):
    jds = miner5.mine_jds_with_lhs(["k"], limit=0)
    # the full split is a valid JD and must be found
    assert any(jd.components == frozenset(
        [frozenset("a"), frozenset("b"), frozenset("c")]) for jd in jds)
    for jd in jds:
        assert miner5.jd_measure(jd) <= miner5.epsilon + 1e-5


def test_min_sep_mining(miner5):
    seps = miner5.mine_all_min_seps()
    # {k} is the unique minimal separator for every pair
    assert seps == {frozenset(["k"])}
    for pair, pseps in miner5.min_pairwise_seps.items():
        if "k" in pair:
            continue  # pairs involving k: separator may be empty/none
        assert pseps == {frozenset(["k"])}, pair


def test_full_mvds(miner5):
    full = miner5.mine_all_full_mvds()
    assert any(jd.lhs == frozenset(["k"]) and len(jd.components) == 3
               for jd in full)


def test_cc_reduction_agrees_with_merge_loop(miner5, spark):
    """B7 is implemented twice (pairwise merge loop + violation-graph
    connected components, mirroring the reference's two variants); they must
    produce identical consistent JDs on every fixture."""
    cases = [(["k"], None, None), (["k"], "a", "b"), ([], "a", "b"),
             (["k", "a"], "b", "c")]
    for lhs, x, y in cases:
        start = JD.most_specific(frozenset(lhs), miner5.schema)
        got1 = miner5.consistent_jd_candidate(lhs, start, x, y)
        got2 = miner5.consistent_jd_candidate_cc(lhs, start, x, y)
        assert got1 == got2, (lhs, x, y)
    # correlated fixture: b == c forces a transitive merge
    rows = [(k, a, v, (v + k) % 4, v) for k in range(6) for a in range(3)
            for v in range(4)]
    df = spark.createDataFrame(rows, ["k", "a", "b", "c", "d"])
    m = JDMiner(MeasureEngine(SparkEntropyEngine(df)), epsilon=0.0)
    try:
        for lhs, x, y in [(["k"], None, None), (["k"], "b", "d"),
                          (["k", "a"], None, None)]:
            start = JD.most_specific(frozenset(lhs), m.schema)
            assert m.consistent_jd_candidate(lhs, start, x, y) == \
                m.consistent_jd_candidate_cc(lhs, start, x, y), (lhs, x, y)
    finally:
        m.eng.unpersist()


def test_cc_reduction_agrees_on_gate_relation(spark):
    """Cross-check on the sf0.01 gate relation (the driver's b11/b15 input):
    both reductions agree for every attribute pair at the seeding lhs
    R - {x,y} and at the known planted separators."""
    import itertools as it
    c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    n = spark.read.parquet("/root/testdata/sf0.01/nation.parquet")
    r = spark.read.parquet("/root/testdata/sf0.01/region.parquet")
    cols = ["c_custkey", "c_nationkey", "c_mktsegment",
            "n_name", "n_regionkey", "r_name"]
    denorm = (c.join(n, c.c_nationkey == n.n_nationkey)
               .join(r, n.n_regionkey == r.r_regionkey).select(*cols))
    m = JDMiner(MeasureEngine(SparkEntropyEngine(denorm)), epsilon=0.0)
    try:
        full = frozenset(cols)
        lhs_list = [frozenset(["c_nationkey"]), frozenset(["n_name"])]
        for x, y in it.combinations(cols, 2):
            for lhs in [full - {x, y}] + lhs_list:
                if x in lhs or y in lhs:
                    continue
                start = JD.most_specific(lhs, m.schema)
                assert m.consistent_jd_candidate(lhs, start, x, y) == \
                    m.consistent_jd_candidate_cc(lhs, start, x, y), (lhs, x, y)
    finally:
        m.eng.unpersist()


def test_min_sep_mining_mode_invariant(planted5):
    """Eager-CUBE + parallel pairs, lazy + sequential, and lazy + parallel
    must mine identical separator sets (r2 perf work is pinned to be a pure
    plan change, never a semantic one)."""
    results = []
    for kwargs in ({},  # default: eager cube, 8 parallel pairs
                   {"eager_cells": 0, "max_parallel_pairs": 1},
                   {"eager_cells": 0, "max_parallel_pairs": 8}):
        miner = JDMiner(MeasureEngine(SparkEntropyEngine(planted5)),
                        epsilon=0.0, **kwargs)
        results.append(miner.mine_all_min_seps())
        miner.eng.unpersist()
    assert results[0] == results[1] == results[2] == {frozenset(["k"])}


def test_dfs_equals_bfs_mined_sets(miner5, spark):
    """B8 ships in both traversal orders (reference has BFS and stack-DFS
    with resume indices); with limit=0 they must mine identical JD sets —
    the same cross-check pattern as B7's two reductions."""
    cases = [(["k"], None, None), (["k"], "a", "b"), ([], "a", "b"),
             (["k", "a"], "b", "c"), ([], None, None)]
    for lhs, x, y in cases:
        bfs = miner5.mine_jds_with_lhs(lhs, limit=0, x=x, y=y)
        dfs = miner5.mine_jds_with_lhs_dfs(lhs, limit=0, x=x, y=y)
        assert bfs == dfs, (lhs, x, y)
    # limit>0: order picks WHICH JDs surface, but both must surface valid
    # ones from the same universe
    b1 = miner5.mine_jds_with_lhs(["k"], limit=1)
    d1 = miner5.mine_jds_with_lhs_dfs(["k"], limit=1)
    universe = miner5.mine_jds_with_lhs(["k"], limit=0)
    assert len(b1) == len(d1) == 1
    assert b1 <= universe and d1 <= universe
    # correlated fixture (transitive merges exercised)
    rows = [(k, a, v, (v + k) % 4, v) for k in range(6) for a in range(3)
            for v in range(4)]
    df = spark.createDataFrame(rows, ["k", "a", "b", "c", "d"])
    m = JDMiner(MeasureEngine(SparkEntropyEngine(df)), epsilon=0.0)
    try:
        for lhs, x, y in [(["k"], None, None), (["k"], "b", "d"),
                          (["k", "a"], None, None)]:
            assert m.mine_jds_with_lhs(lhs, limit=0, x=x, y=y) == \
                m.mine_jds_with_lhs_dfs(lhs, limit=0, x=x, y=y), (lhs, x, y)
    finally:
        m.eng.unpersist()


def test_dfs_search_mode_min_seps_invariant(planted5):
    """End-to-end: a JDMiner running every B8 call through the DFS twin
    mines the same minimal separators as the default BFS miner."""
    m = JDMiner(MeasureEngine(SparkEntropyEngine(planted5)), epsilon=0.0,
                search="dfs")
    try:
        assert m.mine_all_min_seps() == {frozenset(["k"])}
    finally:
        m.eng.unpersist()


def test_dfs_equals_bfs_on_gate_relation(spark):
    """DFS == BFS on the sf0.01 gate relation at the min-sep seeding lhs
    for a spread of attribute pairs."""
    c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    n = spark.read.parquet("/root/testdata/sf0.01/nation.parquet")
    r = spark.read.parquet("/root/testdata/sf0.01/region.parquet")
    cols = ["c_custkey", "c_nationkey", "c_mktsegment",
            "n_name", "n_regionkey", "r_name"]
    denorm = (c.join(n, c.c_nationkey == n.n_nationkey)
               .join(r, n.n_regionkey == r.r_regionkey).select(*cols))
    m = JDMiner(MeasureEngine(SparkEntropyEngine(denorm)), epsilon=0.0)
    full = frozenset(cols)
    try:
        for x, y in [("c_mktsegment", "n_name"), ("c_custkey", "r_name"),
                     ("n_regionkey", "c_mktsegment")]:
            lhs = full - {x, y}
            assert m.mine_jds_with_lhs(lhs, limit=0, x=x, y=y) == \
                m.mine_jds_with_lhs_dfs(lhs, limit=0, x=x, y=y), (x, y)
    finally:
        m.eng.unpersist()
