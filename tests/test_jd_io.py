"""JD (.sep) serialization: round-trip + reference-format line parsing."""

import pytest

from relationaldecomposition_spark.core.deps import JD
from relationaldecomposition_spark.sources.jd_io import (
    jd_from_line, jd_to_line, read_jds, write_jds)

SCHEMA = [f"col{i}" for i in range(13)]


def test_parse_reference_format_line():
    # literal example from AcyclicSchemaEnumerator.java:155
    line = "13,{{4, 9}|{1},{6, 11},{2, 5, 7, 8, 10, 12},{3}},8.881784197001252E-16"
    jd = jd_from_line(line, SCHEMA)
    assert jd.lhs == frozenset(["col4", "col9"])
    assert frozenset(["col6", "col11"]) in jd.components
    assert frozenset(["col2", "col5", "col7", "col8", "col10", "col12"]) in jd.components
    assert len(jd.components) == 4
    assert jd.measure.value == pytest.approx(8.88e-16, abs=1e-17)


def test_round_trip(tmp_path):
    schema = ["a", "b", "c", "d", "e"]
    jds = [
        JD(frozenset(["b"]), frozenset([frozenset(["a"]),
                                        frozenset(["c", "d"]),
                                        frozenset(["e"])])),
        JD(frozenset(["c", "e"]), frozenset([frozenset(["a", "b"]),
                                             frozenset(["d"])])),
    ]
    for jd in jds:
        jd.measure.set_value(0.25)
    path = str(tmp_path / "mined.sep")
    assert write_jds(jds, path, schema) == 2
    back = read_jds(path, schema)
    assert set(back) == set(jds)  # JD equality = (lhs, components)
    for jd in back:
        assert jd.measure.value == pytest.approx(0.25)


def test_schema_mismatch_rejected():
    with pytest.raises(ValueError, match="declares 13"):
        jd_from_line("13,{{0}|{1},{2}},0.0", ["a", "b", "c"])


def test_mining_to_enumeration_via_file(tmp_path, spark):
    """The real pipeline: mine -> write .sep -> read -> enumerate."""
    from relationaldecomposition_spark.engine.entropy import SparkEntropyEngine
    from relationaldecomposition_spark.engine.measures import MeasureEngine
    from relationaldecomposition_spark.mining.jd_miner import JDMiner
    from relationaldecomposition_spark.schema.acyclic import AcyclicSchemaEnumerator
    from tests.conftest import load

    c = load(spark, "customer")
    n = load(spark, "nation")
    denorm = (c.join(n, c.c_nationkey == n.n_nationkey)
               .select("c_custkey", "c_nationkey", "c_mktsegment", "n_name"))
    schema = denorm.columns
    miner = JDMiner(MeasureEngine(SparkEntropyEngine(denorm)), epsilon=0.0)
    miner.mine_all_min_seps()
    path = str(tmp_path / "mined.sep")
    write_jds(miner.mined_jds, path, schema)
    back = read_jds(path, schema)
    assert set(back) == set(miner.mined_jds)
    schemas = list(AcyclicSchemaEnumerator(schema, back))
    assert schemas
    miner.eng.unpersist()
