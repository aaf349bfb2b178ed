"""IVF ANN: numpy oracle for assignment/Lloyd, exactness when probing every
cell, measured recall for partial probes (same harness shape as
test_similarity_recall.py), and plan audit (no cartesian product — the
candidate join must be a broadcast equi-join on cell)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from relationaldecomposition_spark.operators import ivf, similarity
from tests.conftest import load

K = 5
QIDS = list(range(10))
CIDS = list(range(0, 480, 30))  # 16 seed centroids


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    pd = emb.select("vec_id", "embedding").toPandas()
    return {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in pd.itertuples()}


@pytest.fixture(scope="module")
def truth(emb):
    exact = similarity.cosine_topk(emb, "embedding", "vec_id", QIDS, K).toPandas()
    return set(zip(exact.query_id, exact.neighbor_id))


def _np_assign(emb_np, centroids):
    out = {}
    for vid, v in emb_np.items():
        best = min(centroids, key=lambda c: (float(np.sum((v - np.asarray(c[1])) ** 2)), c[0]))
        out[vid] = best[0]
    return out


def test_assign_cells_matches_numpy(emb, emb_np):
    cents = ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)
    got = {r["vec_id"]: r["cell"]
           for r in ivf.assign_cells(emb, "embedding", "vec_id", cents).collect()}
    assert got == _np_assign(emb_np, cents)


def test_seed_centroids_missing_id_raises(emb):
    with pytest.raises(ValueError, match="not found"):
        ivf.seed_centroids(emb, "embedding", "vec_id", [0, 10_000_000])


def test_lloyd_refine_matches_numpy(emb, emb_np):
    cents = ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)
    got = ivf.lloyd_refine(emb, "embedding", "vec_id", cents, iters=1)
    assign = _np_assign(emb_np, cents)
    for cid, cv in got:
        members = [emb_np[v] for v, c in assign.items() if c == cid]
        exp = np.mean(members, axis=0) if members else np.asarray(
            dict(cents)[cid])
        assert np.allclose(cv, exp, atol=1e-9), cid


def test_probe_all_cells_is_exact(emb, truth):
    out = ivf.ivf_topk(emb, "embedding", "vec_id", QIDS, K,
                       centroid_ids=CIDS, n_probes=len(CIDS)).toPandas()
    assert set(zip(out.query_id, out.neighbor_id)) == truth


def test_partial_probe_recall_floor(emb, truth):
    """Near-orthogonal synthetic vectors scatter neighbors across cells, so
    IVF recall tracks the probed fraction; half the cells must beat 0.5 and
    monotonicity must hold (probe set grows -> candidate superset)."""
    def recall(n_probes, lloyd_iters=0):
        out = ivf.ivf_topk(emb, "embedding", "vec_id", QIDS, K,
                           centroid_ids=CIDS, n_probes=n_probes,
                           lloyd_iters=lloyd_iters).toPandas()
        return len(set(zip(out.query_id, out.neighbor_id)) & truth) / len(truth)

    r8 = recall(8)
    assert r8 >= 0.5, f"8/16-probe recall {r8}"
    assert recall(12) >= r8
    # Lloyd refinement must not break the pipeline; recall stays sane
    assert recall(8, lloyd_iters=1) >= 0.4


def test_plan_no_cartesian(emb):
    plan = ivf.ivf_topk(emb, "embedding", "vec_id", QIDS, K,
                        centroid_ids=CIDS, n_probes=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bad_probe_count(emb):
    with pytest.raises(ValueError, match="n_probes"):
        ivf.ivf_topk(emb, "embedding", "vec_id", QIDS, K,
                     centroid_ids=CIDS, n_probes=0)


# ---------------------------------------------------------------------------
# SemDeDup (cluster-scoped near-dup pairs + greedy survivor set)
# ---------------------------------------------------------------------------

SD_TAU = 0.3


@pytest.fixture(scope="module")
def sd_cents(emb):
    return ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)


def test_semdedup_pairs_subset_of_exact(emb, sd_cents):
    """Within-cell pairs are exactly the exact-verifier pairs whose members
    share a cell — same cosines, never a pair the exact op would reject."""
    from relationaldecomposition_spark.operators import dedup

    sd = ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents,
                            SD_TAU).toPandas()
    exact = dedup.embedding_cosine_pairs(emb, "embedding", "vec_id",
                                         SD_TAU).toPandas()
    cells = dict(ivf.assign_cells(emb, "embedding", "vec_id", sd_cents)
                 .collect())
    got = set(zip(sd.id_a, sd.id_b))
    want = {(a, b) for a, b in zip(exact.id_a, exact.id_b)
            if cells[a] == cells[b]}
    assert got == want and len(got) > 0
    ecos = {(a, b): c for a, b, c in
            zip(exact.id_a, exact.id_b, exact.cosine)}
    for a, b, c in zip(sd.id_a, sd.id_b, sd.cosine):
        assert abs(ecos[(a, b)] - c) < 1e-9


def test_semdedup_apply_matches_pair_policy(emb, sd_cents):
    pairs = ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents,
                               SD_TAU).toPandas()
    out = ivf.semdedup_apply(emb, "embedding", "vec_id", sd_cents,
                             SD_TAU).toPandas()
    dropped = set(pairs.id_b)
    assert len(out) == emb.count()  # every row classified exactly once
    for r in out.itertuples():
        assert r.kept == (r.vec_id not in dropped)


def test_semdedup_deterministic_under_repartition(emb, sd_cents):
    a = sorted(map(tuple, ivf.semdedup_pairs(
        emb, "embedding", "vec_id", sd_cents, SD_TAU).collect()))
    b = sorted(map(tuple, ivf.semdedup_pairs(
        emb.repartition(7, "vec_id"), "embedding", "vec_id", sd_cents,
        SD_TAU).collect()))
    assert a == b


def test_semdedup_plan_no_cartesian(emb, sd_cents):
    plan = ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents, SD_TAU) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Hierarchical SemDeDup (round 5: two-level assignment, joined sub-codebooks)
# ---------------------------------------------------------------------------

H_COARSE = list(range(0, 480, 120))   # K1 = 4
H_SUB_K = 4                           # k2 = 4 -> 16 total cells (== flat)


@pytest.fixture(scope="module")
def h_coarse(emb):
    return ivf.seed_centroids(emb, "embedding", "vec_id", H_COARSE)


def _np_hier_assign(emb_np, coarse, k2):
    """Independent re-derivation: route -> k2 smallest-id members as
    sub-seeds -> nearest sub-seed."""
    routes = _np_assign(emb_np, coarse)
    members: dict[int, list[int]] = {}
    for vid, r in sorted(routes.items()):
        members.setdefault(r, []).append(vid)
    sub = {r: sorted(ms)[:k2] for r, ms in members.items()}
    out = {}
    for vid, v in emb_np.items():
        seeds = sub[routes[vid]]
        out[vid] = min(
            seeds, key=lambda s: (float(np.sum((v - emb_np[s]) ** 2)), s))
    return out


def test_hier_assign_matches_numpy(emb, emb_np, h_coarse):
    subs = ivf.route_sub_codebook(emb, "embedding", "vec_id", h_coarse,
                                  H_SUB_K)
    got = {r["vec_id"]: r["cell"] for r in
           ivf.assign_cells_hier(emb, "embedding", "vec_id", h_coarse, subs)
           .select("vec_id", "cell").collect()}
    want = _np_hier_assign(emb_np, h_coarse, H_SUB_K)
    assert got == want


def _np_hier_multi_assign(emb_np, coarse, k2, p):
    """Numpy oracle for multi-probe routing: per vid, the set of
    (rk, route, cell) for its p nearest routes by (distance, route id),
    with cell = argmin over THAT route's sub-seeds."""
    routes = _np_assign(emb_np, coarse)
    members: dict[int, list[int]] = {}
    for vid, r in sorted(routes.items()):
        members.setdefault(r, []).append(vid)
    sub = {r: sorted(ms)[:k2] for r, ms in members.items()}
    out: dict[int, set] = {}
    for vid, v in emb_np.items():
        ranked = sorted(
            coarse, key=lambda c: (
                float(np.sum((v - np.asarray(c[1])) ** 2)), c[0]))[:p]
        probes = set()
        for rk, (r, _) in enumerate(ranked, start=1):
            if r not in sub:       # route with no members has no cells
                continue
            cell = min(sub[r], key=lambda s: (
                float(np.sum((v - emb_np[s]) ** 2)), s))
            probes.add((rk, r, cell))
        out[vid] = probes
    return out


def test_hier_multi_probe_assign_matches_numpy(emb, emb_np, h_coarse):
    """route_probes=2: both faces (expr and gram) emit exactly the
    numpy-derived (rk, route, cell) probes per vector; rk=1 equals the
    single-probe assignment."""
    want = _np_hier_multi_assign(emb_np, h_coarse, H_SUB_K, 2)
    subs_expr = ivf.route_sub_codebook(emb, "embedding", "vec_id",
                                       h_coarse, H_SUB_K)
    got_e: dict[int, set] = {}
    for r in ivf.assign_cells_hier(emb, "embedding", "vec_id", h_coarse,
                                   subs_expr, route_probes=2).collect():
        got_e.setdefault(r["vec_id"], set()).add(
            (r["_rk"], r["route"], r["cell"]))
    assert got_e == want
    subs_gram = ivf.hier_codebook(emb, "embedding", "vec_id", h_coarse,
                                  H_SUB_K, kernel="gram")
    got_g: dict[int, set] = {}
    for r in ivf._np_assign_with_subs(emb, "embedding", "vec_id", h_coarse,
                                      subs_gram, route_probes=2).collect():
        got_g.setdefault(r["vec_id"], set()).add(
            (r["_rk"], r["route"], r["cell"]))
    assert got_g == want
    # rk=1 matches the default single-probe assignment
    single = _np_hier_assign(emb_np, h_coarse, H_SUB_K)
    prim = {vid: next(c for rk, _, c in probes if rk == 1)
            for vid, probes in got_e.items()}
    assert prim == single
    with pytest.raises(ValueError, match="route_probes"):
        ivf.assign_cells_hier(emb, "embedding", "vec_id", h_coarse,
                              subs_expr, route_probes=99)
    with pytest.raises(ValueError, match="route_probes"):
        ivf._np_routed(emb, "embedding", "vec_id", h_coarse, 0)


def test_semdedup_hier_pairs_multi_probe_oracle(emb, emb_np, h_coarse):
    """route_probes=2 pairs == exact cosine>=tau pairs whose probed-cell
    sets intersect (numpy oracle); a superset of the single-probe pairs;
    one row per (id_a, id_b); expr and gram kernels agree."""
    from relationaldecomposition_spark.operators import dedup

    exact = dedup.embedding_cosine_pairs(emb, "embedding", "vec_id",
                                         SD_TAU).toPandas()
    probes = _np_hier_multi_assign(emb_np, h_coarse, H_SUB_K, 2)
    cells_of = {vid: {c for _, _, c in ps} for vid, ps in probes.items()}
    want = {(a, b) for a, b in zip(exact.id_a, exact.id_b)
            if cells_of[a] & cells_of[b]}

    mp = ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", h_coarse,
                                 H_SUB_K, SD_TAU,
                                 route_probes=2).toPandas()
    got = set(zip(mp.id_a, mp.id_b))
    assert got == want
    assert len(mp) == len(got)  # one row per pair after the dedup
    single = ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", h_coarse,
                                     H_SUB_K, SD_TAU).toPandas()
    assert set(zip(single.id_a, single.id_b)) <= got
    gram = ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", h_coarse,
                                   H_SUB_K, SD_TAU, kernel="gram",
                                   route_probes=2).toPandas()
    assert set(zip(gram.id_a, gram.id_b)) == got


def test_ivf_cell_index_hier_multi_probe_rows(emb, emb_np, h_coarse):
    """route_probes=2 index: per id, exactly its probed cells (<= 2 rows),
    including the primary cell; default stays one row per id."""
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", h_coarse,
                             H_SUB_K, kernel="gram")
    idx = ivf.ivf_cell_index_hier(emb, "embedding", "vec_id", h_coarse,
                                  subs, route_probes=2) \
        .select("vec_id", "cell").toPandas()
    got: dict[int, set] = {}
    for a, c in zip(idx.vec_id, idx.cell):
        got.setdefault(int(a), set()).add(int(c))
    want = {vid: {c for _, _, c in ps}
            for vid, ps in _np_hier_multi_assign(
                emb_np, h_coarse, H_SUB_K, 2).items()}
    assert got == want
    base = ivf.ivf_cell_index_hier(emb, "embedding", "vec_id", h_coarse,
                                   subs).select("vec_id").count()
    assert base == emb.count()


def test_semdedup_incremental_multi_probe_oracle(emb, emb_np, h_coarse):
    """Probe-side multi-probe (flat and hier): hits == numpy-derived
    DISTINCT-partner counts where a batch row sees an index partner iff
    the partner's cell is among its probed cells, and a batch partner
    iff their probed-cell sets intersect; survives unchanged in meaning;
    route_probes=2 finds at least as many non-survivors as 1."""
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    tau = SD_TAU

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb))

    corpus_ids = sorted(v for v in emb_np if v % 2 == 0)
    batch_ids = sorted(v for v in emb_np if v % 2 == 1)

    for face in ("flat", "hier"):
        if face == "flat":
            cents = ivf.seed_centroids(corpus, "embedding", "vec_id",
                                       [i for i in CIDS if i % 2 == 0])
            idx = ivf.ivf_cell_index(corpus, "embedding", "vec_id", cents)
            got_df = ivf.semdedup_incremental(batch, idx, "embedding",
                                              "vec_id", cents, tau,
                                              route_probes=2)
            cents_np = cents
            icell = _np_assign({v: emb_np[v] for v in corpus_ids},
                               cents_np)
            ranked = {}
            for v in batch_ids:
                x = emb_np[v]
                order = sorted(cents_np, key=lambda c: (
                    float(np.sum((x - np.asarray(c[1])) ** 2)), c[0]))
                ranked[v] = {c for c, _ in order[:2]}
        else:
            subs = ivf.hier_codebook(corpus, "embedding", "vec_id",
                                     h_coarse, H_SUB_K, kernel="gram")
            idx = ivf.ivf_cell_index_hier(corpus, "embedding", "vec_id",
                                          h_coarse, subs)
            got_df = ivf.semdedup_incremental(batch, idx, "embedding",
                                              "vec_id", h_coarse, tau,
                                              subs=subs, route_probes=2)
            corpus_np = {v: emb_np[v] for v in corpus_ids}
            icell_full = _np_hier_assign(corpus_np, h_coarse, H_SUB_K)
            icell = {v: icell_full[v] for v in corpus_ids}
            # batch probes against the CORPUS codebook
            routes = _np_assign(corpus_np, h_coarse)
            members: dict[int, list[int]] = {}
            for vid, r in sorted(routes.items()):
                members.setdefault(r, []).append(vid)
            sub_seeds = {r: sorted(ms)[:H_SUB_K]
                         for r, ms in members.items()}
            ranked = {}
            for v in batch_ids:
                x = emb_np[v]
                order = sorted(h_coarse, key=lambda c: (
                    float(np.sum((x - np.asarray(c[1])) ** 2)), c[0]))
                probes = set()
                for r, _ in order[:2]:
                    if r in sub_seeds:
                        probes.add(min(sub_seeds[r], key=lambda s: (
                            float(np.sum((x - emb_np[s]) ** 2)), s)))
                ranked[v] = probes

        got = {r["vec_id"]: (r["n_index_hits"], r["n_batch_hits"],
                             r["survives"]) for r in got_df.collect()}
        for v in batch_ids:
            ih = sum(1 for u in corpus_ids
                     if icell[u] in ranked[v]
                     and cos(emb_np[v], emb_np[u]) >= tau)
            bh = sum(1 for u in batch_ids
                     if u < v and (ranked[u] & ranked[v])
                     and cos(emb_np[v], emb_np[u]) >= tau)
            assert got[v] == (ih, bh, ih == 0 and bh == 0), (face, v)
        # recall monotonicity vs single probe
        if face == "flat":
            single = ivf.semdedup_incremental(batch, idx, "embedding",
                                              "vec_id", cents, tau)
            s1 = {r["vec_id"] for r in single.collect()
                  if not r["survives"]}
            s2 = {v for v, (ih, bh, s) in got.items() if not s}
            assert s1 <= s2
    with pytest.raises(ValueError, match="distinct_partners"):
        ivf.semdedup_incremental(batch, idx, "embedding", "vec_id",
                                 h_coarse, tau, subs=subs,
                                 route_probes=2, distinct_partners=False)


def test_semdedup_hier_pairs_subset_of_exact(emb, emb_np, h_coarse):
    from relationaldecomposition_spark.operators import dedup

    sd = ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", h_coarse,
                                 H_SUB_K, SD_TAU).toPandas()
    exact = dedup.embedding_cosine_pairs(emb, "embedding", "vec_id",
                                         SD_TAU).toPandas()
    cells = _np_hier_assign(emb_np, h_coarse, H_SUB_K)
    got = set(zip(sd.id_a, sd.id_b))
    want = {(a, b) for a, b in zip(exact.id_a, exact.id_b)
            if cells[a] == cells[b]}
    assert got == want and len(got) > 0


def test_semdedup_hier_recall_comparable_to_flat(emb, sd_cents, h_coarse):
    """Same total cell count (16): the two-level partition must not cost
    meaningful recall vs the flat codebook — the round-5 'recall unchanged'
    gate for swapping in the scalable assignment."""
    from relationaldecomposition_spark.operators import dedup

    exact = dedup.embedding_cosine_pairs(emb, "embedding", "vec_id",
                                         SD_TAU).count()
    flat = ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents,
                              SD_TAU).count()
    hier = ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", h_coarse,
                                   H_SUB_K, SD_TAU).count()
    assert exact > 0
    r_flat, r_hier = flat / exact, hier / exact
    assert r_hier >= 0.8 * r_flat, (r_flat, r_hier)


def test_semdedup_hier_apply_matches_pair_policy(emb, h_coarse):
    pairs = ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", h_coarse,
                                    H_SUB_K, SD_TAU).toPandas()
    out = ivf.semdedup_apply_hier(emb, "embedding", "vec_id", h_coarse,
                                  H_SUB_K, SD_TAU).toPandas()
    dropped = set(pairs.id_b)
    assert len(out) == emb.count()
    for r in out.itertuples():
        assert r.kept == (r.vec_id not in dropped)


def test_semdedup_hier_apply_multi_probe_matches_pair_face(emb, h_coarse):
    """route_probes=2 on the apply face (round-10 verdict ask #3): the
    drop set must be exactly the pair face's id_b set AT THE SAME p, the
    output must stay unique per id, and the reported cell must be the
    PRIMARY (p=1) assignment — so the end-to-end dedup inherits the pair
    face's measured recall without changing the survivor-row shape."""
    pairs = ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", h_coarse,
                                    H_SUB_K, SD_TAU,
                                    route_probes=2).toPandas()
    dropped = set(pairs.id_b)
    single = ivf.semdedup_apply_hier(emb, "embedding", "vec_id", h_coarse,
                                     H_SUB_K, SD_TAU).toPandas()
    for kernel in ("expr", "gram"):
        out = ivf.semdedup_apply_hier(emb, "embedding", "vec_id", h_coarse,
                                      H_SUB_K, SD_TAU, kernel=kernel,
                                      route_probes=2).toPandas()
        assert len(out) == emb.count()
        assert out.vec_id.is_unique
        for r in out.itertuples():
            assert r.kept == (r.vec_id not in dropped)
        # primary cell assignment identical to the single-probe face
        cells = dict(zip(out.vec_id, out.cell))
        assert cells == dict(zip(single.vec_id, single.cell))
    # multi-probe can only widen the drop set (pairs across route
    # boundaries), never shrink it
    assert dropped >= set(
        ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", h_coarse,
                                H_SUB_K, SD_TAU).toPandas().id_b)


def test_semdedup_hier_deterministic_under_repartition(emb, h_coarse):
    a = sorted(map(tuple, ivf.semdedup_pairs_hier(
        emb, "embedding", "vec_id", h_coarse, H_SUB_K, SD_TAU).collect()))
    b = sorted(map(tuple, ivf.semdedup_pairs_hier(
        emb.repartition(7, "vec_id"), "embedding", "vec_id", h_coarse,
        H_SUB_K, SD_TAU).collect()))
    assert a == b and len(a) > 0


def test_semdedup_hier_plan_no_cartesian_no_literal_codebook(emb, h_coarse):
    """No cross product anywhere, and the SUB-codebook must arrive via a
    join, not plan literals: growing k2 must not grow the plan text (the
    flat path's plan size is linear in cells — the economics the
    hierarchy fixes)."""
    p4 = ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", h_coarse,
                                 4, SD_TAU) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p4
    assert "BroadcastNestedLoopJoin" not in p4
    p32 = ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", h_coarse,
                                  32, SD_TAU) \
        ._jdf.queryExecution().executedPlan().toString()
    assert abs(len(p32) - len(p4)) < 0.05 * len(p4), \
        (len(p4), len(p32))


def test_semdedup_after_prior_evaluation_regression(spark, sd_cents,
                                                    h_coarse):
    """Regression (round 5): self-joining pairs over a frame the caller
    already evaluated used to die with [INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND]
    (relation dedup missing lambda-internal references). The _fresh
    re-projection must make both faces immune."""
    from tests.conftest import SF_DIR
    emb2 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb2.count()  # the trigger: evaluate BEFORE building the self-join
    assert ivf.semdedup_pairs(emb2, "embedding", "vec_id", sd_cents,
                              SD_TAU).count() > 0
    assert ivf.semdedup_pairs_hier(emb2, "embedding", "vec_id", h_coarse,
                                   H_SUB_K, SD_TAU).count() > 0


def test_max_cell_guard_subset_and_validation(emb, sd_cents, h_coarse):
    """Hot-cell split guard: capped pairs are a strict subset of the
    uncapped within-cell pairs, on both faces; bad cap rejected."""
    unc = {(r.id_a, r.id_b) for r in ivf.semdedup_pairs(
        emb, "embedding", "vec_id", sd_cents, SD_TAU).collect()}
    cap = {(r.id_a, r.id_b) for r in ivf.semdedup_pairs(
        emb, "embedding", "vec_id", sd_cents, SD_TAU,
        max_cell=5).collect()}
    assert cap <= unc and len(cap) < len(unc)
    unc_h = {(r.id_a, r.id_b) for r in ivf.semdedup_pairs_hier(
        emb, "embedding", "vec_id", h_coarse, H_SUB_K, SD_TAU).collect()}
    cap_h = {(r.id_a, r.id_b) for r in ivf.semdedup_pairs_hier(
        emb, "embedding", "vec_id", h_coarse, H_SUB_K, SD_TAU,
        max_cell=5).collect()}
    assert cap_h <= unc_h and len(cap_h) < len(unc_h)
    with pytest.raises(ValueError):
        ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents, SD_TAU,
                           max_cell=0).collect()
