"""ANN recall measurement: the LSH-bucketed top-k is approximate by design —
these tests turn the documented probabilistic trade-off into measured
numbers against the exact cosine_topk baseline (VERDICT r2 item #2).

The synthetic embeddings are near-orthogonal (true-neighbor cosine ~0.3-0.5,
per-plane agreement p ~= 0.6), so a single 8-plane table has bucket-match
probability p^8 ~= 0.03 — recall is structurally low no matter the probes.
The scale path is the OR-construction (L tables of b planes) with
multi-probe on top; the o15 config (b=3, L=10, p=2) reaches recall 1.0 here
and is pinned at >= 0.9.
"""

import pytest

from relationaldecomposition_spark.operators import similarity
from tests.conftest import load

K = 5
QIDS = list(range(10))


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, "embeddings")


@pytest.fixture(scope="module")
def truth(spark, emb):
    exact = similarity.cosine_topk(emb, "embedding", "vec_id", QIDS, K).toPandas()
    return set(zip(exact.query_id, exact.neighbor_id))


def _recall(emb, truth, **kw):
    approx = similarity.lsh_bucketed_topk(
        emb, "embedding", "vec_id", QIDS, K, **kw).toPandas()
    got = set(zip(approx.query_id, approx.neighbor_id))
    return len(got & truth) / len(truth)


def test_o15_config_recall_floor(emb, truth):
    from relationaldecomposition_spark.operators.registry import (
        ANN_PLANES, ANN_PROBES, ANN_TABLES)
    r = _recall(emb, truth, n_planes=ANN_PLANES, n_tables=ANN_TABLES,
                n_probes=ANN_PROBES)
    assert r >= 0.9, f"o15 ANN config recall {r} below floor"


def test_multi_table_beats_single_table(emb, truth):
    single = _recall(emb, truth, n_planes=3, n_tables=1, n_probes=1)
    multi = _recall(emb, truth, n_planes=3, n_tables=10, n_probes=1)
    assert multi > single
    assert multi >= 0.8


def test_multi_probe_widens_candidates(emb, truth):
    # same tables, more probes: recall can only grow (candidate superset)
    r1 = _recall(emb, truth, n_planes=4, n_tables=6, n_probes=1)
    r2 = _recall(emb, truth, n_planes=4, n_tables=6, n_probes=3)
    assert r2 >= r1


def test_srp_pairs_precision_and_recall(spark, emb):
    """srp_near_dup_pairs is a strict subset of the exact pairs (precision
    1.0 — every candidate is re-scored with the true cosine) with measured
    recall from the OR-construction; on the near-orthogonal fixture the
    o23 config (b=3, L=10) recovers >= 85% of the exact tau-pairs."""
    from relationaldecomposition_spark.operators import dedup
    from relationaldecomposition_spark.operators.registry import (
        ANN_PLANES, ANN_TABLES, COSINE_TAU)
    exact = dedup.embedding_cosine_pairs(
        emb, "embedding", "vec_id", COSINE_TAU).toPandas()
    truth_pairs = set(zip(exact.id_a, exact.id_b))
    approx = similarity.srp_near_dup_pairs(
        emb, "embedding", "vec_id", COSINE_TAU, n_planes=ANN_PLANES,
        n_tables=ANN_TABLES).toPandas()
    got = set(zip(approx.id_a, approx.id_b))
    assert got <= truth_pairs, "precision must be 1.0 (exact re-rank)"
    assert len(got) / len(truth_pairs) >= 0.85


def test_srp_pairs_guard_bounds_candidates(spark, emb):
    """With the hot-bucket cap engaged the pair set is a subset of the
    unguarded one and the plan stays cross-product-free."""
    capped = similarity.srp_near_dup_pairs(
        emb, "embedding", "vec_id", 0.0, n_planes=2, n_tables=2,
        max_bucket=16)
    full = similarity.srp_near_dup_pairs(
        emb, "embedding", "vec_id", 0.0, n_planes=2, n_tables=2)
    got = {tuple(r) for r in capped.select("id_a", "id_b").collect()}
    allp = {tuple(r) for r in full.select("id_a", "id_b").collect()}
    assert got < allp  # strictly fewer: 2-plane buckets exceed the cap
    # cap=16 bounds within-bucket pair fan-out to C(16,2) per (tbl, bk)
    assert len(got) <= 2 * (2 ** 2) * (16 * 15 // 2)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_ann_plan_has_no_cross_product(spark, emb):
    df = similarity.lsh_bucketed_topk(emb, "embedding", "vec_id", QIDS, K,
                                      n_planes=3, n_tables=10, n_probes=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_probe_bounds_validated(emb):
    with pytest.raises(ValueError):
        similarity.lsh_bucketed_topk(emb, "embedding", "vec_id", QIDS, K,
                                     n_planes=3, n_probes=5)


def test_random_projection_preserves_distances(spark):
    """JL property on real fixture embeddings: projected pairwise squared
    distances stay within a broad distortion band of the originals
    (16 dims -> coarse but correlated), and one vector matches a Python
    recompute of the exact sign-matrix fold."""
    import math

    from relationaldecomposition_spark.operators.similarity import (
        random_projection, rp_sign_matrix)
    from tests.conftest import load

    emb = load(spark, "embeddings").limit(40)
    orig = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    proj = {r["vec_id"]: list(r["y"]) for r in
            random_projection(emb, "embedding", "vec_id").collect()}
    assert all(len(y) == 16 for y in proj.values())

    # exact recompute of one vector
    vid = min(orig)
    signs = rp_sign_matrix(64, 16, 7)
    scale = 1.0 / math.sqrt(16)
    for j in range(16):
        acc = 0.0
        for x, s in zip(orig[vid], signs[j]):
            acc += float(x) * s
        expect = math.floor(acc * scale * 1e6 + 0.5) / 1e6
        assert proj[vid][j] == pytest.approx(expect, abs=1e-9)

    # distortion band over sampled pairs (JL with 16 dims is coarse:
    # assert the mean ratio is ~1 and no pair collapses/explodes wildly)
    ids = sorted(orig)[:20]
    ratios = []
    for a, b in zip(ids, ids[1:]):
        d_o = sum((float(x) - float(y)) ** 2
                  for x, y in zip(orig[a], orig[b]))
        d_p = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
        if d_o > 0:
            ratios.append(d_p / d_o)
    mean = sum(ratios) / len(ratios)
    assert 0.6 < mean < 1.4, mean
    assert all(0.1 < r < 3.5 for r in ratios), ratios
