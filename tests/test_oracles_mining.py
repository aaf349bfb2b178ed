"""The mining oracles are themselves load-bearing (they certify the driver
gate), so pin their behavior: the b15 oracle must emit a pinned schema ONLY
when the data certifies it (junction-tree edge-JD measures <= ACCURACY and
edge separators among the b11-derived minimal separators), and must reject
malformed pins at build time. No Spark needed — DuckDB over sf0.001."""

import glob
import os

import duckdb
import pytest

from relationaldecomposition_spark.oracles_mining import (
    _edge_jds, _junction_tree_edges, oracle_b15)
from relationaldecomposition_spark.queries import (
    B15_SCHEMAS, DENORM6_COLS, DENORM_SQL)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for p in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_junction_tree_star():
    cl = [frozenset(c) for c in B15_SCHEMAS[2]]  # star around c_custkey
    edges = _junction_tree_edges(cl)
    assert len(edges) == len(cl) - 1
    for s, ua, ub in _edge_jds(cl):
        assert s == frozenset({"c_custkey"})
        assert ua | ub == frozenset().union(*cl)
        assert ua & ub == s


def test_junction_tree_rejects_disconnected():
    with pytest.raises(ValueError, match="disconnected"):
        _junction_tree_edges([frozenset({"a", "b"}), frozenset({"c", "d"})])


def test_junction_tree_rejects_cyclic():
    # triangle hypergraph ab, bc, ca: any spanning tree violates
    # running-intersection (a∩c not on the ab—bc path)
    with pytest.raises(ValueError, match="running-intersection"):
        _junction_tree_edges([frozenset({"a", "b"}), frozenset({"b", "c"}),
                              frozenset({"c", "a"})])


def test_pinned_schemas_certify_on_data(con):
    df = con.execute(oracle_b15(DENORM_SQL, DENORM6_COLS, B15_SCHEMAS)).fetchdf()
    assert len(df) == len(B15_SCHEMAS)
    assert (df["spurious"] == 0).all()


def test_bogus_schema_emits_no_row(con):
    # c_mktsegment separates nothing: a star around it is a valid junction
    # tree shape but its edge JDs fail the measure check on the data
    bad = [(("c_custkey", "c_mktsegment"), ("c_mktsegment", "c_nationkey"),
            ("c_mktsegment", "n_name"), ("c_mktsegment", "n_regionkey"),
            ("c_mktsegment", "r_name"))]
    df = con.execute(oracle_b15(DENORM_SQL, DENORM6_COLS, bad)).fetchdf()
    assert len(df) == 0


def test_single_cluster_schema_is_trivially_ok(con):
    # one cluster = no junction-tree edges; the oracle must not emit a
    # malformed zero-row VALUES clause, and the schema certifies trivially
    # (a single full-schema cluster has zero spurious tuples by definition)
    single = [(tuple(DENORM6_COLS),)]
    df = con.execute(oracle_b15(DENORM_SQL, DENORM6_COLS, single)).fetchdf()
    assert len(df) == 1
    assert df["n_clusters"][0] == 1
    assert df["spurious"][0] == 0
