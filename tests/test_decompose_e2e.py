"""End-to-end decomposition deliverable (bench `decompose_e2e`, round-6
headline): mine min-sep JDs on the denormalized relation, enumerate
acyclic schemas, validate spurious tuples, bucketed-write the best schema
— and pin that the WRITTEN tables natural-join back to exactly the
original relation (lossless-join decomposition, the reference's core
correctness property)."""

from functools import reduce

import pytest
from pyspark.sql import functions as F

from relationaldecomposition_spark.engine.decompose import (
    DecompositionValidator, write_decomposition_bucketed)
from relationaldecomposition_spark.engine.entropy import SparkEntropyEngine
from relationaldecomposition_spark.engine.measures import MeasureEngine
from relationaldecomposition_spark.mining.jd_miner import JDMiner
from relationaldecomposition_spark.schema.acyclic import (
    AcyclicSchemaEnumerator, validate_schema)
from relationaldecomposition_spark.sources.tables import (
    denorm_customer_nation_region)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def denorm(spark):
    return denorm_customer_nation_region(spark, SF_DIR)


def _mine_best(denorm, limit=3):
    miner = JDMiner(MeasureEngine(SparkEntropyEngine(denorm)), epsilon=0.0)
    miner.mine_all_min_seps()
    v = DecompositionValidator(denorm)
    best, best_key = None, None
    try:
        for i, schema in enumerate(AcyclicSchemaEnumerator(
                tuple(denorm.columns), sorted(miner.mined_jds, key=str))):
            if i >= limit:
                break
            info = validate_schema(v, schema)
            key = (int(info.spurious_tuples), -len(schema.clusters))
            if best_key is None or key < best_key:
                best, best_key = schema, key
    finally:
        v.close()
        miner.eng.unpersist()
    return best, best_key


def test_best_mined_schema_rejoins_losslessly(spark, denorm):
    best, best_key = _mine_best(denorm)
    assert best is not None and len(best.clusters) >= 2
    assert best_key[0] == 0, "exact mining (epsilon=0) must yield a " \
        "spurious-free schema on the planted decomposition"
    names = write_decomposition_bucketed(denorm, best.clusters,
                                         "c_nationkey", "t_e2e")
    try:
        parts = [spark.table(n) for n in names]

        def nat_join(a, b):
            shared = sorted(set(a.columns) & set(b.columns))
            return a.join(b, on=shared) if shared else a.crossJoin(b)

        rejoined = reduce(nat_join, parts).select(*denorm.columns)
        base = denorm.distinct()
        # set equality: symmetric difference empty both ways
        assert rejoined.exceptAll(base).count() == 0
        assert base.exceptAll(rejoined).count() == 0
    finally:
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_best_schema_clusters_cover_all_columns(spark, denorm):
    best, _ = _mine_best(denorm)
    covered = set()
    for cl in best.clusters:
        covered |= {str(c) for c in cl}
    assert covered == set(denorm.columns)
