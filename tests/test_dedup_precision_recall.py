"""Precision/recall harness for the near-dup family (VERDICT r2 item #8):
LSH band-bucket candidates measured against exact n-gram Jaccard ground
truth, over several (n_hashes, bands) configs — turns the documented
banding trade-off (shorter bands -> more candidates -> higher recall,
lower precision) into asserted numbers.

Ground truth = pairs with exact Jaccard >= 0.5 (the o05 operator).
Candidates = any band-bucket collision (min_est=0, i.e. before the
est_jaccard filter), the o03 operator's recall-critical stage.
"""

import pytest

from relationaldecomposition_spark.operators import dedup
from tests.conftest import load

TAU = 0.5
SHINGLE_K = 3


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, "documents")


@pytest.fixture(scope="module")
def truth(docs):
    exact = dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                      SHINGLE_K, TAU).toPandas()
    pairs = set(zip(exact.id_a, exact.id_b))
    assert pairs, "fixture has no true near-dup pairs - harness is vacuous"
    return pairs


def _pr(docs, truth, n_hashes, bands, min_est=0.0):
    cand = dedup.lsh_candidate_pairs(docs, "text", "doc_id", n_hashes, bands,
                                     SHINGLE_K, min_est).toPandas()
    cset = set(zip(cand.id_a, cand.id_b))
    tp = len(cset & truth)
    return (tp / len(cset) if cset else 0.0,
            tp / len(truth))


# Floors set from measured values (sf0.001: 1.0/0.875, 1.0/0.718, 1.0/1.0)
# with headroom; theory: P(candidate | J) = 1-(1-J^r)^b for r rows/band.
@pytest.mark.parametrize("n_hashes,bands,min_prec,min_rec", [
    (8, 4, 0.75, 0.95),    # default config: r=2 bands catch J>=0.5 reliably
    (16, 8, 0.55, 0.95),   # more bands: recall pressure, precision cost
    (8, 2, 0.85, 0.85),    # longer bands (r=4): precision up, recall risk
])
def test_lsh_candidate_floors(docs, truth, n_hashes, bands, min_prec, min_rec):
    prec, rec = _pr(docs, truth, n_hashes, bands)
    assert prec >= min_prec, f"precision {prec:.3f} < {min_prec}"
    assert rec >= min_rec, f"recall {rec:.3f} < {min_rec}"


def test_est_filter_raises_precision(docs, truth):
    """The est_jaccard >= 0.5 post-filter must not hurt precision and must
    keep recall: estimated Jaccard concentrates around the true value."""
    p0, r0 = _pr(docs, truth, 8, 4, min_est=0.0)
    p1, r1 = _pr(docs, truth, 8, 4, min_est=0.5)
    assert p1 >= p0
    assert r1 >= 0.9
