"""Partition-count invariance: driver-query results must be byte-identical
whatever spark.sql.shuffle.partitions is — the property that lets the same
code run on local[4] and a 1000-executor cluster. Any operator whose output
depends on physical partitioning (per-partition nondeterminism, unordered
floating-point reduction surfacing in output, first()-style tie-breaks)
fails here long before it corrupts a 100 TB run.

Representative set, one per plan family: grouping-sets aggregate (a08),
LSH self-join (o03), window packing (o51), join+agg composition (o50),
count-derived thresholds (o52), and the skew-report's single-row cross
join (o37).
"""

import pytest

from relationaldecomposition_spark.queries import QUERIES

from conftest import SF_DIR

CHECK = [
    "a08_entropy_batch",
    "o03_lsh_pairs",
    "o50_incremental_dedup",
    "o51_pack_sequences",
    "o52_rebalance_mixture",
    "o37_skew_report",
    # r10: ADC ranking — float tie-breaks + window rank under a
    # broadcast-join plan family
    "o76_pq_topk",
]


@pytest.fixture(scope="module")
def spark7(spark):
    """A sibling session sharing the JVM but with a different (prime,
    deliberately awkward) shuffle partition count."""
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "7")
    return s


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


@pytest.mark.parametrize("name", CHECK)
def test_result_independent_of_shuffle_partitions(spark, spark7, name):
    a = _rows(QUERIES[name](spark, SF_DIR))
    b = _rows(QUERIES[name](spark7, SF_DIR))
    assert a == b, f"{name} output depends on shuffle partitioning"
