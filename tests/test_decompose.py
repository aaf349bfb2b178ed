"""Decomposition validation vs the naive-join oracle (the reference's own
dual-algorithm test: SmallDBInMemory.main runs testDecomposition and
spuritousTuples on the same clusters and compares)."""

import pytest

from relationaldecomposition_spark.engine.decompose import (
    DecompositionValidator, write_decomposition)
from tests.conftest import load


@pytest.fixture(scope="module")
def denorm(spark):
    """customer ⋈ nation ⋈ region denormalized — the planted decomposition
    to validate (FIXTURES.md F6)."""
    c = load(spark, "customer")
    n = load(spark, "nation")
    r = load(spark, "region")
    return (c.join(n, c.c_nationkey == n.n_nationkey)
             .join(r, n.n_regionkey == r.r_regionkey)
             .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                     "c_mktsegment", "n_name", "n_regionkey", "r_name"))


GOOD = [
    ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ["c_nationkey", "n_name", "n_regionkey"],
    ["n_regionkey", "r_name"],
]
BAD = [
    ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
    ["c_custkey", "c_nationkey", "n_name"],
    ["n_regionkey", "r_name", "c_mktsegment"],
]


def test_lossless_decomposition_zero_spurious(denorm):
    v = DecompositionValidator(denorm)
    info = v.process_decomposition(GOOD)
    assert info.spurious_tuples == 0
    assert info.total_tuples == sum(info.cluster_sizes.values())
    assert info.smallest_relation <= info.largest_relation
    # cells = tuples * arity per cluster
    assert info.total_cells == sum(
        cnt * len(c) for c, cnt in info.cluster_sizes.items())
    v.close()


def test_lossy_decomposition_matches_naive_oracle(denorm):
    v = DecompositionValidator(denorm)
    fold = v.process_decomposition(BAD).spurious_tuples
    naive = v.naive_join_spurious(BAD)
    assert fold == naive
    assert fold > 0  # BAD splits correlated columns => spurious tuples
    v.close()


def test_duplicate_rows_are_dedupped_first(spark):
    # validation path dedups the base: duplicates must not count as spurious
    rows = [(1, "a", "p"), (1, "a", "p"), (2, "b", "q")]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    v = DecompositionValidator(df)
    assert v.num_tuples == 2
    info = v.process_decomposition([["k", "x"], ["k", "y"]])
    assert info.spurious_tuples == 0
    v.close()


def test_single_cluster_and_given_order(denorm):
    v = DecompositionValidator(denorm)
    info = v.process_decomposition([["c_custkey", "c_nationkey"]], order="given")
    # single cluster: join size is the projection size
    assert info.spurious_tuples == info.total_tuples - v.num_tuples
    v.close()


def test_disconnected_clusters_cartesian(spark):
    # clusters sharing no attributes: join is a cartesian product
    rows = [(1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, ["k", "x"])
    v = DecompositionValidator(df)
    info = v.process_decomposition([["k"], ["x"]])
    assert info.spurious_tuples == 2 * 2 - 2
    assert info.spurious_tuples == v.naive_join_spurious([["k"], ["x"]])
    v.close()


def test_write_decomposition(denorm, tmp_path):
    out = write_decomposition(denorm, GOOD, str(tmp_path / "decomp"))
    assert len(out) == 3
    spark = denorm.sparkSession
    # re-joining the written tables reconstructs the base exactly
    dfs = [spark.read.parquet(p) for p in out]
    rejoined = dfs[0].join(dfs[1], "c_nationkey").join(dfs[2], "n_regionkey")
    assert rejoined.distinct().count() == denorm.distinct().count()
