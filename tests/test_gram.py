"""Gram-matrix pair kernel (operators/gram.py): the vectorized scale face
of the within-group cosine pair join. Pinned properties:

- kernel equality: for every caller (flat SemDeDup, capped SemDeDup,
  hierarchical SemDeDup, SRP-LSH near-dup pairs) the gram kernel returns
  the SAME pair set as the default expression kernel, with cosines equal
  to ~1e-9 (BLAS vs left-to-right summation differs in the last ulp; the
  gate data has no cosine within 1e-9 of tau — asserted, so the sets
  cannot legally diverge at the boundary).
- determinism under repartition (rows sorted by id inside the group, so
  the BLAS layout is partition-independent).
- plan shape: ONE shuffle on the group key feeding FlatMapGroupsInPandas;
  no join, no cartesian product.
"""

import numpy as np
import pytest

from pyspark.sql import functions as F

from relationaldecomposition_spark.operators import dedup, ivf, similarity
from tests.conftest import load

SD_TAU = 0.3
CIDS = list(range(0, 480, 30))


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, "embeddings")


@pytest.fixture(scope="module")
def sd_cents(emb):
    return ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)


def _pairs(df):
    pd = df.toPandas()
    return {(a, b): c for a, b, c in zip(pd.id_a, pd.id_b, pd.cosine)}


def _assert_same_pairs(expr_df, gram_df, tau):
    e, g = _pairs(expr_df), _pairs(gram_df)
    assert set(e) == set(g)
    assert len(e) > 0
    for k, c in e.items():
        assert abs(c - g[k]) < 1e-9, k
        # the boundary-divergence caveat cannot trigger on this data
        assert abs(c - tau) > 1e-9, k


def test_flat_semdedup_kernels_agree(emb, sd_cents):
    _assert_same_pairs(
        ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents, SD_TAU),
        ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents, SD_TAU,
                           kernel="gram"),
        SD_TAU)


def test_capped_semdedup_kernels_agree(emb, sd_cents):
    """max_cell splits via the SHARED _with_sub column, so even the
    sacrificed cross-sub-cell pairs match between kernels."""
    _assert_same_pairs(
        ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents, SD_TAU,
                           max_cell=20),
        ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents, SD_TAU,
                           max_cell=20, kernel="gram"),
        SD_TAU)


def test_hier_semdedup_kernels_agree(emb):
    coarse = ivf.seed_centroids(emb, "embedding", "vec_id",
                                list(range(0, 400, 100)))
    _assert_same_pairs(
        ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", coarse, 4,
                                SD_TAU),
        ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", coarse, 4,
                                SD_TAU, kernel="gram"),
        SD_TAU)


def test_srp_kernels_agree(emb):
    _assert_same_pairs(
        similarity.srp_near_dup_pairs(emb, "embedding", "vec_id", SD_TAU,
                                      n_planes=8, n_tables=4),
        similarity.srp_near_dup_pairs(emb, "embedding", "vec_id", SD_TAU,
                                      n_planes=8, n_tables=4,
                                      kernel="gram"),
        SD_TAU)


def test_srp_kernels_agree_with_bucket_cap(emb):
    _assert_same_pairs(
        similarity.srp_near_dup_pairs(emb, "embedding", "vec_id", SD_TAU,
                                      n_planes=4, n_tables=2,
                                      max_bucket=40),
        similarity.srp_near_dup_pairs(emb, "embedding", "vec_id", SD_TAU,
                                      n_planes=4, n_tables=2,
                                      max_bucket=40, kernel="gram"),
        SD_TAU)


def test_gram_deterministic_under_repartition(emb, sd_cents):
    a = sorted(map(tuple, ivf.semdedup_pairs(
        emb, "embedding", "vec_id", sd_cents, SD_TAU,
        kernel="gram").collect()))
    b = sorted(map(tuple, ivf.semdedup_pairs(
        emb.repartition(7, "vec_id"), "embedding", "vec_id", sd_cents,
        SD_TAU, kernel="gram").collect()))
    assert a == b and len(a) > 0


def test_gram_apply_matches_expr_apply(emb, sd_cents):
    e = ivf.semdedup_apply(emb, "embedding", "vec_id", sd_cents,
                           SD_TAU).toPandas()
    g = ivf.semdedup_apply(emb, "embedding", "vec_id", sd_cents, SD_TAU,
                           kernel="gram").toPandas()
    assert (sorted(zip(e.vec_id, e.cell, e.kept))
            == sorted(zip(g.vec_id, g.cell, g.kept)))


def test_gram_plan_one_grouped_pandas_no_join(emb, sd_cents):
    plan = ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents, SD_TAU,
                              kernel="gram") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gram_blocked_path_matches_unblocked(spark):
    """Force the internal row-block cap so the blocked gram loop runs, and
    pin it against the unblocked numpy oracle."""
    from relationaldecomposition_spark.operators import gram as gram_mod

    rng = np.random.default_rng(7)
    n, dim, tau = 300, 16, 0.2
    x = rng.normal(size=(n, dim))
    rows = [(i, 0, [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "id bigint, g int, v array<double>")
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    c = xn @ xn.T
    iu = np.triu_indices(n, 1)
    want = {(int(i), int(j)) for i, j in zip(*iu) if c[i, j] >= tau}
    old = gram_mod._BLOCK_ELEMS
    gram_mod._BLOCK_ELEMS = 16 * n  # block of 16 rows
    try:
        pdf = gram_mod.gram_group_pairs(df, ["g"], "id", "v", tau).toPandas()
        got = {(int(a), int(b)) for a, b in zip(pdf.id_a, pdf.id_b)}
    finally:
        gram_mod._BLOCK_ELEMS = old
    assert got == want and len(want) > 1000


def test_np_assignment_matches_expression_argmin(emb, sd_cents):
    """The BLAS argmin (mapInPandas, score = |c|²−2x·c) must agree with
    the literal-expression (distance, cell)-sort assignment on the gate
    data — the tie-break caveat (ulp-equidistant centroids) must not
    trigger here."""
    expr = dict(ivf.assign_cells(emb, "embedding", "vec_id", sd_cents)
                .collect())
    got = {r["vec_id"]: r["cell"]
           for r in ivf._np_assigned(emb, "embedding", "vec_id", sd_cents)
           .select("vec_id", "cell").collect()}
    assert got == expr


def test_ivf_topk_np_kernel_matches_expr(emb):
    """ivf_topk(kernel=\"np\") must return the same neighbors/ranks as the
    literal-argmin face at every probe depth tried."""
    for n_probes in (4, 16):
        e = ivf.ivf_topk(emb, "embedding", "vec_id", list(range(10)), 5,
                         centroid_ids=CIDS, n_probes=n_probes).toPandas()
        g = ivf.ivf_topk(emb, "embedding", "vec_id", list(range(10)), 5,
                         centroid_ids=CIDS, n_probes=n_probes,
                         kernel="np").toPandas()
        assert (sorted(zip(e.query_id, e.neighbor_id, e["rank"]))
                == sorted(zip(g.query_id, g.neighbor_id, g["rank"])))


def test_gram_handles_singleton_and_empty_groups(spark):
    from relationaldecomposition_spark.operators.gram import gram_group_pairs

    df = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 1, [1.0, 0.0]), (3, 1, [1.0, 0.001])],
        "id bigint, g int, v array<double>")
    out = gram_group_pairs(df, ["g"], "id", "v", 0.9).collect()
    assert [(r.g, r.id_a, r.id_b) for r in out] == [(1, 2, 3)]


# ---------------------------------------------------------------------------
# incremental SemDeDup (probe-only vs persisted cell index)
# ---------------------------------------------------------------------------

def test_semdedup_incremental_matches_batch_semantics(emb, sd_cents):
    """With index = even ids and batch = odd ids, the incremental result
    must equal the numpy re-derivation from the FULL batch pair set: per
    odd id, index hits = within-tau even partners sharing its cell,
    batch hits = within-tau smaller odd partners sharing its cell."""
    from pyspark.sql import functions as F

    idx_df = ivf.ivf_cell_index(emb.where(F.col("vec_id") % 2 == 0),
                                "embedding", "vec_id", sd_cents)
    new_df = emb.where(F.col("vec_id") % 2 == 1)
    out = ivf.semdedup_incremental(new_df, idx_df, "embedding", "vec_id",
                                   sd_cents, SD_TAU).toPandas()

    full = ivf.semdedup_pairs(emb, "embedding", "vec_id", sd_cents,
                              SD_TAU, kernel="gram").toPandas()
    import collections
    ih = collections.Counter()
    bh = collections.Counter()
    for a, b in zip(full.id_a, full.id_b):
        for odd, other in ((a, b), (b, a)):
            if odd % 2 == 1:
                if other % 2 == 0:
                    ih[odd] += 1
                elif other < odd:
                    bh[odd] += 1
    got = {r.vec_id: (r.n_index_hits, r.n_batch_hits, r.survives)
           for r in out.itertuples()}
    assert len(got) == new_df.count()
    for vid, (gih, gbh, gs) in got.items():
        assert (gih, gbh) == (ih[vid], bh[vid]), vid
        assert gs == (gih == 0 and gbh == 0)
    assert any(not s for _, _, s in got.values())  # some dups found


def test_semdedup_incremental_never_compares_index_to_index(spark):
    """Planted case: two near-identical INDEX rows in one cell must not
    produce any hit for an unrelated new row, and the cross kernel must
    not emit index-index pairs (checked via the raw kernel output)."""
    import numpy as np

    from relationaldecomposition_spark.operators.gram import (
        gram_group_pairs_cross)

    rows = [
        (0, 0, [1.0, 0.0, 0.0], False),   # index pair (identical)
        (1, 0, [1.0, 0.0, 0.0], False),
        (2, 0, [0.0, 1.0, 0.0], True),    # new, orthogonal to index
        (3, 0, [0.0, 1.0, 0.001], True),  # new, near-dup of id 2
    ]
    df = spark.createDataFrame(
        rows, "id bigint, g int, v array<double>, is_new boolean")
    pairs = gram_group_pairs_cross(df, ["g"], "id", "v", "is_new",
                                   0.9).toPandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert got == {(2, 3)}  # no (0,1) index-index pair, no cross hits


H_CIDS = list(range(0, 480, 120))  # 4 coarse routes
H_K2 = 4


def test_semdedup_incremental_hier_matches_batch_semantics(emb):
    """Hier incremental face (semdedup_incremental(subs=...)): with the
    codebook and index both derived from the EVEN corpus, the result must
    equal the numpy re-derivation from the all-rows assignment against
    that SAME persisted codebook — per odd id, index hits = within-tau
    even partners sharing its cell, batch hits = within-tau smaller odd
    partners. Pins that the batch rides the persisted codebook (not one
    re-derived from the batch) and that the broadcast route-prune does
    not change values."""
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    coarse = ivf.seed_centroids(corpus, "embedding", "vec_id", H_CIDS)
    subs = ivf.hier_codebook(corpus, "embedding", "vec_id", coarse, H_K2)
    idx_df = ivf.ivf_cell_index_hier(corpus, "embedding", "vec_id",
                                     coarse, subs)
    new_df = emb.where(F.col("vec_id") % 2 == 1)
    out = ivf.semdedup_incremental(new_df, idx_df, "embedding", "vec_id",
                                   coarse, SD_TAU, subs=subs).toPandas()

    # expected: assign ALL rows with the persisted codebook, then count
    # within-cell within-tau partners numpy-side
    allpd = (ivf.ivf_cell_index_hier(emb, "embedding", "vec_id",
                                     coarse, subs).toPandas())
    vecs = {int(r.vec_id): np.asarray(r.v, dtype=np.float64)
            for r in allpd.itertuples()}
    cell = {int(r.vec_id): int(r.cell) for r in allpd.itertuples()}
    import collections
    ih = collections.Counter()
    bh = collections.Counter()
    ids = sorted(cell)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if cell[a] != cell[b]:
                continue
            va, vb = vecs[a], vecs[b]
            cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            if cos < SD_TAU:
                continue
            for odd, other in ((a, b), (b, a)):
                if odd % 2 == 1:
                    if other % 2 == 0:
                        ih[odd] += 1
                    elif other < odd:
                        bh[odd] += 1
    got = {r.vec_id: (r.n_index_hits, r.n_batch_hits, r.survives)
           for r in out.itertuples()}
    assert len(got) == new_df.count()  # route-less odd rows still present
    for vid, (gih, gbh, gs) in got.items():
        assert (gih, gbh) == (ih[vid], bh[vid]), vid
        assert gs == (gih == 0 and gbh == 0)
    assert any(not s for _, _, s in got.values())


def test_semdedup_incremental_hier_prune_plan_and_parity(emb):
    """The per-batch assignment must (a) prune the persisted codebook with
    a broadcast semi-join on the batch's touched routes — the plan carries
    a broadcast LeftSemi — and (b) equal the unpruned assignment delivered
    via the ``assigned=`` escape hatch."""
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    coarse = ivf.seed_centroids(corpus, "embedding", "vec_id", H_CIDS)
    subs = ivf.hier_codebook(corpus, "embedding", "vec_id", coarse, H_K2)
    idx_df = ivf.ivf_cell_index_hier(corpus, "embedding", "vec_id",
                                     coarse, subs)
    new_df = emb.where(F.col("vec_id") % 2 == 1)

    pruned = ivf.semdedup_incremental(new_df, idx_df, "embedding",
                                      "vec_id", coarse, SD_TAU, subs=subs)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan

    unpruned_assigned = ivf.ivf_cell_index_hier(new_df, "embedding",
                                                "vec_id", coarse, subs)
    viaassigned = ivf.semdedup_incremental(new_df, idx_df, "embedding",
                                           "vec_id", coarse, SD_TAU,
                                           assigned=unpruned_assigned)
    a = pruned.toPandas().sort_values("vec_id").reset_index(drop=True)
    b = viaassigned.toPandas().sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# Arrow fingerprint kernel (round 6)
# ---------------------------------------------------------------------------

def test_fingerprint_arrow_bit_identical(spark):
    """Integer arithmetic end-to-end: the Arrow kernel must equal the HOF
    expression EXACTLY on gate data plus planted whitespace edge cases
    (Spark SQL trim strips SPACE only; Java \\s is ASCII — NBSP must NOT
    split, control chars stay in tokens)."""
    from relationaldecomposition_spark.operators.text import fingerprint

    docs = load(spark, "documents")
    e = dict(fingerprint(docs, "text", "doc_id").collect())
    g = dict(fingerprint(docs, "text", "doc_id", kernel="arrow").collect())
    assert e == g and len(e) == docs.count()

    nasty = spark.createDataFrame(
        [(1, "  alpha beta gamma  "),       # edge whitespace
         (2, "a\tb\nc\rd"),                 # ascii ws variants
         (3, "one two"),                    # < k tokens -> -1
         (4, ""), (5, None),                # empty / null -> -1
         (6, "x y z w"),               # NBSP: not a Java \s split
         (7, "\x08ctrl lead trail\x08 a b")  # control chars <= U+0020
         ], "doc_id bigint, text string")
    e = dict(fingerprint(nasty, "text", "doc_id").collect())
    g = dict(fingerprint(nasty, "text", "doc_id",
                         kernel="arrow").collect())
    assert e == g
    assert e[3] == -1 and e[4] == -1 and e[5] == -1


def test_lloyd_refine_np_kernel_matches_expr(emb, sd_cents):
    """lloyd_refine(kernel=\"np\"): same assignment → same per-cell means
    up to the documented ~ulp summation tolerance."""
    e = ivf.lloyd_refine(emb, "embedding", "vec_id", sd_cents, iters=1)
    g = ivf.lloyd_refine(emb, "embedding", "vec_id", sd_cents, iters=1,
                         kernel="np")
    assert [c for c, _ in e] == [c for c, _ in g]
    for (_, ve), (_, vg) in zip(e, g):
        assert np.allclose(ve, vg, atol=1e-9)


# ---------------------------------------------------------------------------
# round-7 hardening: dirty data + 64-bit cell ids (advisor findings r6)
# ---------------------------------------------------------------------------

def test_gram_tolerates_null_and_ragged_vectors(spark):
    """Null vectors and length-mismatched pairs must be DROPPED (the
    expression kernel's zip_with/aggregate yields null cosine there), not
    crash the task with a ragged-object-array matmul TypeError. Same-length
    subgroups still pair among themselves."""
    from relationaldecomposition_spark.operators.gram import gram_group_pairs

    df = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.001]),       # 2-dim near-dup
         (3, 0, None),                                    # null vector
         (4, 0, [1.0, 0.0, 0.0]), (5, 0, [1.0, 0.0, 0.001]),  # 3-dim pair
         (6, 0, [0.0, 1.0])],                             # 2-dim, far
        "id bigint, g int, v array<double>")
    out = gram_group_pairs(df, ["g"], "id", "v", 0.9).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2), (4, 5)}


def test_gram_cross_tolerates_null_and_ragged_vectors(spark):
    from relationaldecomposition_spark.operators.gram import (
        gram_group_pairs_cross)

    df = spark.createDataFrame(
        [(1, 0, [1.0, 0.0], False), (2, 0, [1.0, 0.001], True),
         (3, 0, None, True),
         (4, 0, [1.0, 0.0, 0.0], False), (5, 0, [1.0, 0.0, 0.001], True)],
        "id bigint, g int, v array<double>, is_new boolean")
    out = gram_group_pairs_cross(df, ["g"], "id", "v", "is_new",
                                 0.9).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2), (4, 5)}


def test_np_assignment_cell_ids_are_long(spark):
    """Centroid ids are row ids (bigint). Ids >= 2^31 must survive the
    BLAS assignment un-wrapped, matching the expression face's BIGINT."""
    from pyspark.sql.types import LongType

    big = 2**31 + 5
    df = spark.createDataFrame(
        [(1, [0.0, 0.1]), (2, [10.0, 9.9])],
        "vec_id bigint, embedding array<double>")
    cents = [(big, [0.0, 0.0]), (big + 1, [10.0, 10.0])]
    out = ivf._np_assigned(df, "embedding", "vec_id", cents)
    assert isinstance(out.schema["cell"].dataType, LongType)
    got = {r.vec_id: r.cell for r in out.collect()}
    assert got == {1: big, 2: big + 1}


def test_orphan_location_cleanup_rejects_escaping_names(spark, tmp_path):
    """A table 'name' containing path separators or .. must never rmtree
    outside the warehouse dir (names derive from caller table prefixes)."""
    import os

    from relationaldecomposition_spark.engine.decompose import (
        _remove_orphan_table_location)

    victim = tmp_path / "victim"
    victim.mkdir()
    (victim / "keep.txt").write_text("x")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    # names that must be no-ops
    for name in (f"../{victim}", str(victim), "a/b", "..", "a;b"):
        _remove_orphan_table_location(spark, name)
    assert os.path.exists(victim / "keep.txt")
    assert wh  # the session has a warehouse; the guard didn't need it gone


def test_auto_kernel_dispatch_by_volume(spark):
    """kernel="auto" resolves by rows x copies x dim vs AUTO_EXPR_MAX_VOLUME;
    explicit kernels pass through untouched."""
    from relationaldecomposition_spark.operators.gram import (
        AUTO_EXPR_MAX_VOLUME, resolve_pair_kernel)

    df = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])],
                               "id bigint, v array<double>")
    assert resolve_pair_kernel(df, "v", "auto") == "expr"      # 2*2 elems
    big = AUTO_EXPR_MAX_VOLUME  # 2 rows * big copies * 2 dims > threshold
    assert resolve_pair_kernel(df, "v", "auto", copies=big) == "gram"
    assert resolve_pair_kernel(df, "v", "gram") == "gram"
    assert resolve_pair_kernel(df, "v", "expr", copies=big) == "expr"
    # auto faces produce the same pairs whichever kernel wins
    out = similarity.srp_near_dup_pairs(df, "v", "id", 0.0, n_planes=2,
                                        dim=2, kernel="auto")
    assert out.count() == 0  # orthogonal vectors share no sign bucket


def test_hier_codebook_lloyd_iters(emb):
    """lloyd_iters moves sub-centroid POSITIONS only: same routes, same
    cell-id sets, refined cv = the members' per-dim mean (cells with no
    members keep their seed position); iters=0 is byte-identical to the
    default; the expr face rejects the knob."""
    import pytest

    corpus = emb.where(F.col("vec_id") % 2 == 0)
    coarse = ivf.seed_centroids(corpus, "embedding", "vec_id", H_CIDS)
    seed = ivf.hier_codebook(corpus, "embedding", "vec_id", coarse, H_K2)
    seed0 = ivf.hier_codebook(corpus, "embedding", "vec_id", coarse, H_K2,
                              lloyd_iters=0)
    ref = ivf.hier_codebook(corpus, "embedding", "vec_id", coarse, H_K2,
                            lloyd_iters=1)
    s, s0, r = (x.toPandas().set_index("route").sort_index()
                for x in (seed, seed0, ref))
    assert [sorted(c["cell"] for c in cb) for cb in s["cb"]] \
        == [sorted(c["cell"] for c in cb) for cb in s0["cb"]] \
        == [sorted(c["cell"] for c in cb) for cb in r["cb"]]
    # refined centroids equal the numpy per-cell mean of the SEED-cell
    # assignment
    ass = (ivf._np_assign_with_subs(corpus, "embedding", "vec_id",
                                    coarse, seed)
           .select("vec_id", "v", "route", "cell").toPandas())
    import collections
    members = collections.defaultdict(list)
    for row in ass.itertuples():
        members[(int(row.route), int(row.cell))].append(
            np.asarray(row.v, dtype=np.float64))
    moved = 0
    for route, row in r.iterrows():
        seed_cb = {c["cell"]: np.asarray(c["cv"])
                   for c in s.loc[route, "cb"]}
        for c in row["cb"]:
            m = members.get((int(route), int(c["cell"])))
            exp = (np.mean(m, axis=0) if m
                   else seed_cb[c["cell"]])
            assert np.allclose(np.asarray(c["cv"]), exp, atol=1e-9)
            if m is not None and not np.allclose(exp,
                                                 seed_cb[c["cell"]]):
                moved += 1
    assert moved > 0  # the pass really refined something
    with pytest.raises(ValueError, match="lloyd_iters"):
        ivf.hier_codebook(corpus, "embedding", "vec_id", coarse, H_K2,
                          kernel="expr", lloyd_iters=1)


def test_cell_index_store_probe_uses_partition_pruning(emb, tmp_path):
    """The on-disk continuous-ingest contract: against a
    write_cell_index store, the incremental probe's touched-cell
    semi-join must compile to dynamic partition pruning (the scan reads
    only touched cells' directories) and return exactly the in-memory
    index's rows."""
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    cents = ivf.seed_centroids(corpus, "embedding", "vec_id", H_CIDS)
    idx = ivf.ivf_cell_index(corpus, "embedding", "vec_id", cents)
    path = str(tmp_path / "cellidx")
    ivf.write_cell_index(idx, path)
    stored = ivf.read_cell_index(idx.sparkSession, path)

    mem = ivf.semdedup_incremental(batch, idx, "embedding", "vec_id",
                                   cents, SD_TAU, prune_index=True)
    disk = ivf.semdedup_incremental(batch, stored, "embedding", "vec_id",
                                    cents, SD_TAU, prune_index=True)
    plan = disk._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert {tuple(r) for r in disk.collect()} \
        == {tuple(r) for r in mem.collect()}


def test_cell_store_compaction_bounds_files_and_keeps_dpp(emb, tmp_path):
    """Continuous ingest (round-10 ask #5): N appended batches leave N
    small files in every touched cell; compact_cell_index rewrites ONLY
    the over-cap cells down to a bounded file count, rows and probe
    results are unchanged, untouched cells keep their files, and the
    DPP-pruned probe plan is still pinned."""
    corpus = emb.where(F.col("vec_id") % 5 == 0)
    cents = ivf.seed_centroids(corpus, "embedding", "vec_id", H_CIDS)
    path = str(tmp_path / "cellstore")
    ivf.write_cell_index(
        ivf.ivf_cell_index(corpus, "embedding", "vec_id", cents), path)
    for m in (1, 2, 3):   # three ingest batches, appended
        batch = emb.where(F.col("vec_id") % 5 == m)
        ivf.write_cell_index(
            ivf.ivf_cell_index(batch, "embedding", "vec_id", cents),
            path, mode="append")
    before = ivf.cell_store_file_stats(emb.sparkSession, path)
    assert max(n for n, _ in before.values()) >= 4  # the small-files debt
    rows_before = {(r["vec_id"], tuple(r["v"]), r["cell"]) for r in
                   ivf.read_cell_index(emb.sparkSession, path).collect()}

    res = ivf.compact_cell_index(emb.sparkSession, path,
                                 max_files_per_cell=1)
    after = ivf.cell_store_file_stats(emb.sparkSession, path)
    assert res["compacted_cells"] == len(
        [v for v, (n, _) in before.items() if n > 1])
    assert max(n for n, _ in after.values()) == 1   # bounded files/cell
    assert res["files_after"] == sum(n for n, _ in after.values())
    # rows byte-identical through the rewrite
    rows_after = {(r["vec_id"], tuple(r["v"]), r["cell"]) for r in
                  ivf.read_cell_index(emb.sparkSession, path).collect()}
    assert rows_after == rows_before
    # probe still DPP-pruned and identical to the in-memory result
    probe = emb.where(F.col("vec_id") % 5 == 4)
    stored = ivf.read_cell_index(emb.sparkSession, path)
    disk = ivf.semdedup_incremental(probe, stored, "embedding", "vec_id",
                                    cents, SD_TAU, prune_index=True)
    plan = disk._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    mem_idx = stored.localCheckpoint(eager=True)
    mem = ivf.semdedup_incremental(probe, mem_idx, "embedding", "vec_id",
                                   cents, SD_TAU, prune_index=True)
    assert {tuple(r) for r in disk.collect()} \
        == {tuple(r) for r in mem.collect()}
    # idempotent: nothing left over cap
    res2 = ivf.compact_cell_index(emb.sparkSession, path,
                                  max_files_per_cell=1)
    assert res2["compacted_cells"] == 0


def test_probe_during_compaction_semantics(emb, tmp_path):
    """What a reader sees mid-compaction (round-10 verdict ask #7): ANY
    reader created before the partition swap — spark.read.parquet
    captures the file listing at build time, acted on or not — fails
    LOUDLY (FAILED_READ_FILE, a catchable SparkException) rather than
    returning stale/partial rows, and re-creating the reader recovers.
    Pins the recipe compact_cell_index's docstring gives."""
    import pytest

    spark = emb.sparkSession
    corpus = emb.where(F.col("vec_id") % 5 == 0)
    cents = ivf.seed_centroids(corpus, "embedding", "vec_id", H_CIDS)
    path = str(tmp_path / "concstore")
    ivf.write_cell_index(
        ivf.ivf_cell_index(corpus, "embedding", "vec_id", cents), path)
    for m in (1, 2, 3):
        ivf.write_cell_index(
            ivf.ivf_cell_index(emb.where(F.col("vec_id") % 5 == m),
                               "embedding", "vec_id", cents),
            path, mode="append")

    stale = ivf.read_cell_index(spark, path)
    n_true = stale.count()
    unacted = ivf.read_cell_index(spark, path)  # built now, never acted

    res = ivf.compact_cell_index(spark, path, max_files_per_cell=1)
    assert res["compacted_cells"] > 0

    # any pre-compaction reader fails loudly, never silently partial —
    # the listing is captured at read-build time, so acted and unacted
    # readers fail the same way
    with pytest.raises(Exception, match="FAILED_READ_FILE"):
        stale.count()
    with pytest.raises(Exception, match="FAILED_READ_FILE"):
        unacted.count()
    # recovery recipe: a fresh reader
    assert ivf.read_cell_index(spark, path).count() == n_true


def test_probe_cell_store_recovers_across_compaction(emb, tmp_path):
    """The recovery recipe as CODE (round-11 verdict ask #6):
    probe_cell_store seeded with a reader planned BEFORE a compaction
    must return the correct rows where the raw reader's action raises
    FAILED_READ_FILE — and must not swallow unrelated failures."""
    import pytest

    spark = emb.sparkSession
    corpus = emb.where(F.col("vec_id") % 5 == 0)
    cents = ivf.seed_centroids(corpus, "embedding", "vec_id", H_CIDS)
    path = str(tmp_path / "recoverstore")
    ivf.write_cell_index(
        ivf.ivf_cell_index(corpus, "embedding", "vec_id", cents), path)
    ivf.write_cell_index(
        ivf.ivf_cell_index(emb.where(F.col("vec_id") % 5 == 1),
                           "embedding", "vec_id", cents),
        path, mode="append")

    probe = lambda df: df.groupBy("cell").count()
    expected = {(r["cell"], r["count"]) for r in
                probe(ivf.read_cell_index(spark, path)).collect()}

    # plan a reader, compact between plan and action
    stale = ivf.read_cell_index(spark, path)
    assert ivf.compact_cell_index(spark, path,
                                  max_files_per_cell=1)["compacted_cells"]
    with pytest.raises(Exception, match="FAILED_READ_FILE"):
        probe(stale).collect()
    got = ivf.probe_cell_store(spark, path, probe, index=stale)
    assert {(r["cell"], r["count"]) for r in got} == expected

    # unrelated failures propagate, not retried-and-masked
    with pytest.raises(Exception, match="CANNOT_RESOLVE|cannot.*resolve|"
                                        "UNRESOLVED"):
        ivf.probe_cell_store(spark, path,
                             lambda df: df.select("no_such_column"))


def test_probe_cell_store_retry_marker_policy():
    """The retry fires on the stale-listing marker, matched errorClass-
    first (ADVICE r13): a captured errorClass naming FILE_NOT_EXIST (or
    the FAILED_READ_FILE family) retries even if the message was
    re-wrapped; without an errorClass, the bare FILE_NOT_EXIST class
    substring suffices (an outer layer can keep only the inner class),
    while PATH_NOT_FOUND / "does not exist" (mistyped store path,
    ADVICE r12) still propagates without a second listing. spark=None
    proves which path ran: the retry path raises AttributeError on
    read_cell_index instead of the original error. The chained-retry
    contract is pinned too: when the retry itself fails, the ORIGINAL
    stale-listing error is the __cause__."""
    import pytest

    class _Raises:
        def __init__(self, msg, error_class=None):
            self.msg = msg
            self.error_class = error_class

        def probe(self, df):
            if self.error_class is None:
                raise RuntimeError(self.msg)

            class _Captured(RuntimeError):
                def getErrorClass(inner):
                    return self.error_class

            raise _Captured(self.msg)

    # mistyped path: neither marker -> propagate, no retry
    mistyped = _Raises("PATH_NOT_FOUND: /no/such/store does not exist")
    with pytest.raises(RuntimeError, match="PATH_NOT_FOUND"):
        ivf.probe_cell_store(None, "/no/such/store", mistyped.probe,
                             index=object())

    # family prefix without the FILE_NOT_EXIST leaf (e.g. a corrupt-footer
    # FAILED_READ_FILE sibling) -> different failure, propagate
    sibling = _Raises("FAILED_READ_FILE.PARQUET_COLUMN_DATA_TYPE_MISMATCH")
    with pytest.raises(RuntimeError, match="DATA_TYPE_MISMATCH"):
        ivf.probe_cell_store(None, "/no/such/store", sibling.probe,
                             index=object())

    # combined marker -> retry (AttributeError: spark=None has no reader)
    both = _Raises("FAILED_READ_FILE.FILE_NOT_EXIST: gone mid-compaction")
    with pytest.raises(AttributeError) as exc_info:
        ivf.probe_cell_store(None, "/no/such/store", both.probe,
                             index=object())
    assert isinstance(exc_info.value.__cause__, RuntimeError)
    assert "FAILED_READ_FILE" in str(exc_info.value.__cause__)

    # re-wrapped: only the inner error class survived in the message
    bare = _Raises("Job aborted: FILE_NOT_EXIST while reading cell=3")
    with pytest.raises(AttributeError):
        ivf.probe_cell_store(None, "/no/such/store", bare.probe,
                             index=object())

    # captured errorClass is authoritative over the message text
    cls_wins = _Raises("task failed; see executor logs",
                       error_class="FAILED_READ_FILE.FILE_NOT_EXIST")
    with pytest.raises(AttributeError):
        ivf.probe_cell_store(None, "/no/such/store", cls_wins.probe,
                             index=object())
    not_stale = _Raises("mentions FILE_NOT_EXIST only in prose",
                        error_class="PATH_NOT_FOUND")
    with pytest.raises(RuntimeError, match="prose"):
        ivf.probe_cell_store(None, "/no/such/store", not_stale.probe,
                             index=object())
