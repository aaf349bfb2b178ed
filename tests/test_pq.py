"""Product quantization (operators/pq.py): numpy oracle replaying encode +
ADC ranking end-to-end, expr/np kernel parity, exact-candidate isolation
(probe-all), measured recall floor vs the exact verifier, Lloyd refinement
reducing quantization error, and plan audit (candidate join stays a
broadcast equi-join on cell — the ivf_topk invariant)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from relationaldecomposition_spark.operators import pq
from tests.conftest import load

K = 5
M = 8
QIDS = list(range(10))
CIDS = list(range(0, 480, 30))  # 16 seeds: coarse cells AND PQ codes


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.select("vec_id", "embedding").toPandas()
    return {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in pdf.itertuples()}


@pytest.fixture(scope="module")
def codebooks(emb):
    return pq.pq_seed_codebooks(emb, "embedding", "vec_id", M, CIDS)


def _np_codes(v, codebooks):
    sub = len(codebooks[0][0])
    out = []
    for s, cb in enumerate(codebooks):
        vs = v[s * sub:(s + 1) * sub]
        out.append(min(range(len(cb)), key=lambda j: (
            float(np.sum((vs - np.asarray(cb[j])) ** 2)), j)))
    return out


def _np_adc(q, codes, codebooks):
    sub = len(codebooks[0][0])
    return sum(float(np.sum((q[s * sub:(s + 1) * sub]
                             - np.asarray(codebooks[s][c])) ** 2))
               for s, c in enumerate(codes))


def _np_topk(emb_np, codebooks, n_probes):
    """Full python replay: coarse assign/probe, encode, ADC, rank."""
    cents = [(cid, emb_np[cid]) for cid in CIDS]

    def cells(v, n):
        ranked = sorted(cents, key=lambda c: (
            float(np.sum((v - c[1]) ** 2)), c[0]))
        return [c[0] for c in ranked[:n]]

    assign = {vid: cells(v, 1)[0] for vid, v in emb_np.items()}
    codes = {vid: _np_codes(v, codebooks) for vid, v in emb_np.items()}
    out = set()
    for q in QIDS:
        probed = set(cells(emb_np[q], n_probes))
        cand = [vid for vid, cell in assign.items()
                if cell in probed and vid != q]
        scored = sorted(
            ((_np_adc(emb_np[q], codes[n], codebooks), n) for n in cand))
        for rank, (adc, n) in enumerate(scored[:K], start=1):
            out.add((q, n, round(adc, 9), rank))
    return out


def test_seed_codebook_geometry(codebooks, emb_np):
    assert len(codebooks) == M
    assert all(len(cb) == len(CIDS) for cb in codebooks)
    sub = 64 // M
    assert all(len(cv) == sub for cb in codebooks for cv in cb)
    # codebooks[s][j] is the s-th slice of the j-th seed row
    for j, cid in enumerate(CIDS):
        flat = [x for s in range(M) for x in codebooks[s][j]]
        assert np.allclose(flat, emb_np[cid])


def test_encode_matches_numpy_oracle(emb, emb_np, codebooks):
    got = {int(r.vec_id): list(r.codes)
           for r in pq.pq_encode(emb, "embedding", "vec_id",
                                 codebooks).collect()}
    assert len(got) == len(emb_np)
    for vid, v in emb_np.items():
        assert got[vid] == _np_codes(v, codebooks), vid


def test_encode_kernel_parity(emb, codebooks):
    expr = {int(r.vec_id): list(r.codes)
            for r in pq.pq_encode(emb, "embedding", "vec_id",
                                  codebooks).collect()}
    blas = {int(r.vec_id): list(r.codes)
            for r in pq.pq_encode(emb, "embedding", "vec_id", codebooks,
                                  kernel="np").collect()}
    assert expr == blas


def test_topk_matches_numpy_oracle(emb, emb_np, codebooks):
    out = pq.pq_topk(emb, "embedding", "vec_id", QIDS, K, m=M,
                     codebooks=codebooks, coarse_centroid_ids=CIDS,
                     n_probes=8)
    got = {(int(r.query_id), int(r.neighbor_id), round(float(r.adc), 9),
            int(r.rank)) for r in out.collect()}
    assert got == _np_topk(emb_np, codebooks, n_probes=8)


def test_topk_kernel_parity(emb, codebooks):
    kw = dict(m=M, codebooks=codebooks, coarse_centroid_ids=CIDS,
              n_probes=8)
    expr = {(int(r.query_id), int(r.neighbor_id), round(float(r.adc), 9),
             int(r.rank))
            for r in pq.pq_topk(emb, "embedding", "vec_id", QIDS, K,
                                **kw).collect()}
    blas = {(int(r.query_id), int(r.neighbor_id), round(float(r.adc), 9),
             int(r.rank))
            for r in pq.pq_topk(emb, "embedding", "vec_id", QIDS, K,
                                kernel="np", **kw).collect()}
    assert expr == blas


def test_recall_at_r_floor(emb, emb_np, codebooks):
    """Recall@R (Jégou TPAMI'11 §V's metric: is the true L2 NN inside the
    first R ADC results?), probing every cell to isolate ranking quality.
    The synthetic embeddings are near-uniform random — the ADVERSARIAL
    case for PQ, since pairwise distances concentrate and per-subspace
    quantization noise swamps the margins (real embedding corpora are
    clustered; test_planted_twin_ranks_first pins that regime). Measured
    on the gate data: R=20 -> 0.2, R=50 -> 0.7; floors pinned below the
    measures, plus monotonicity in R."""
    nn1 = {}
    for q in QIDS:
        d = sorted((float(np.sum((emb_np[q] - v) ** 2)), vid)
                   for vid, v in emb_np.items() if vid != q)
        nn1[q] = d[0][1]

    def recall_at(r):
        got = pq.pq_topk(emb, "embedding", "vec_id", QIDS, r, m=M,
                         codebooks=codebooks, coarse_centroid_ids=CIDS,
                         n_probes=len(CIDS)).toPandas()
        byq = got.groupby("query_id")["neighbor_id"].apply(set).to_dict()
        return sum(nn1[q] in byq.get(q, set()) for q in QIDS) / len(QIDS)

    r20, r50 = recall_at(20), recall_at(50)
    assert r50 >= r20
    assert r50 >= 0.5, r50


def test_planted_twin_ranks_first(spark, emb, codebooks):
    """The regime PQ serves in a dedup/similarity pipeline: near-duplicate
    vectors. Plant a tiny perturbation of each query row; ADC must rank
    the twin #1 even with the coarse probe engaged (twin quantizes to the
    same cells/codes as its original)."""
    base = emb.select("vec_id", "embedding")
    twins = (base.where(F.col("vec_id").isin(QIDS))
             .select((F.col("vec_id") + 10000).alias("vec_id"),
                     F.transform("embedding",
                                 lambda x: x + F.lit(1e-4)).alias("embedding")))
    world = base.select("vec_id",
                        F.transform("embedding",
                                    lambda x: x.cast("float"))
                        .alias("embedding")).unionByName(twins)
    got = pq.pq_topk(world, "embedding", "vec_id", QIDS, 1, m=M,
                     codebooks=codebooks, coarse_centroid_ids=CIDS,
                     n_probes=2).toPandas()
    top1 = dict(zip(got.query_id, got.neighbor_id))
    assert all(top1[q] == q + 10000 for q in QIDS), top1


def test_lloyd_reduces_quantization_error(emb, emb_np, codebooks):
    refined = pq.pq_lloyd_refine(emb, "embedding", "vec_id", codebooks,
                                 iters=2)
    assert len(refined) == M
    assert all(len(cb) == len(CIDS) for cb in refined)

    def total_err(cbs):
        return sum(_np_adc(v, _np_codes(v, cbs), cbs)
                   for v in emb_np.values())

    assert total_err(refined) < total_err(codebooks)


def test_validation():
    import pyspark.sql  # noqa: F401  (errors raise before any job runs)
    with pytest.raises(ValueError, match="must divide"):
        pq._check_geometry(64, 7)
    with pytest.raises(ValueError, match="must divide"):
        pq._check_geometry(64, 0)


def test_validation_runtime(emb, codebooks):
    with pytest.raises(ValueError, match="code_ids or codebooks"):
        pq.pq_topk(emb, "embedding", "vec_id", QIDS, K,
                   coarse_centroid_ids=CIDS)
    with pytest.raises(ValueError, match="coarse"):
        pq.pq_topk(emb, "embedding", "vec_id", QIDS, K, codebooks=codebooks)
    with pytest.raises(ValueError, match="n_probes"):
        pq.pq_topk(emb, "embedding", "vec_id", QIDS, K,
                   codebooks=codebooks, coarse_centroid_ids=CIDS,
                   n_probes=0)
    with pytest.raises(ValueError, match="kernel"):
        pq.pq_encode(emb, "embedding", "vec_id", codebooks, kernel="bogus")


def test_plan_no_cartesian(emb, codebooks):
    out = pq.pq_topk(emb, "embedding", "vec_id", QIDS, K, m=M,
                     codebooks=codebooks, coarse_centroid_ids=CIDS,
                     n_probes=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_cell_store_roundtrip_dpp_and_rerank(spark, emb, emb_np, codebooks,
                                             tmp_path):
    """The on-disk IVFADC lifecycle: pq_cell_index -> write_cell_index ->
    read_cell_index -> pq_topk_index must (a) return exactly the in-memory
    pq_topk rows, (b) compile the probe join to dynamic partition pruning
    on the store scan, and (c) feed pq_rerank, whose exact-cosine re-rank
    of an ADC shortlist must bring back at least as many true cosine
    neighbors as the raw ADC head."""
    from relationaldecomposition_spark.operators import ivf, similarity

    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)
    idx = pq.pq_cell_index(emb, "embedding", "vec_id", codebooks, coarse)
    path = str(tmp_path / "pqidx")
    ivf.write_cell_index(idx, path)
    stored = ivf.read_cell_index(spark, path)

    queries = emb.where(F.col("vec_id").isin(QIDS))
    disk = pq.pq_topk_index(stored, queries, "embedding", "vec_id", K,
                            codebooks, coarse, n_probes=8)
    plan = disk._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()

    mem = pq.pq_topk(emb, "embedding", "vec_id", QIDS, K, m=M,
                     codebooks=codebooks, coarse_centroid_ids=CIDS,
                     n_probes=8)
    canon = lambda df: {(int(r.query_id), int(r.neighbor_id),
                         round(float(r.adc), 9), int(r.rank))
                        for r in df.collect()}
    assert canon(disk) == canon(mem)

    # IVFADC-R: exact re-rank of a deep ADC shortlist recovers cosine
    # neighbors the raw ADC head misses (>= because tiny gate data)
    exact = similarity.cosine_topk(emb, "embedding", "vec_id",
                                   QIDS, K).toPandas()
    truth = set(zip(exact.query_id, exact.neighbor_id))
    shortlist = pq.pq_topk_index(stored, queries, "embedding", "vec_id",
                                 50, codebooks, coarse, n_probes=8)
    rr = pq.pq_rerank(shortlist, emb, "embedding", "vec_id", K).toPandas()
    adc_head = mem.toPandas()
    hits_rr = len(truth & set(zip(rr.query_id, rr.neighbor_id)))
    hits_adc = len(truth & set(zip(adc_head.query_id,
                                   adc_head.neighbor_id)))
    assert hits_rr >= hits_adc
    assert hits_rr / len(truth) >= 0.5, hits_rr / len(truth)


def test_hier_route_partitioned_store(spark, emb, codebooks, tmp_path):
    """The million-cell on-disk regime (round-10 verdict ask #4): PQ codes
    under two-level routing, store partitioned by ROUTE with the cell
    predicate pushed into parquet min/max. Pins (a) the plan — static
    route partition filter + pushed In(cell) filter, (b) parity: probing
    every (route, cell) must reproduce the flat probe-all pq_topk ranking
    exactly (same codebooks => same ADC, candidates = everyone), and
    (c) partial probes return adc values consistent with the all-probe
    map."""
    from relationaldecomposition_spark.operators import ivf

    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", coarse, 4,
                             kernel="gram")
    idx = pq.pq_cell_index_hier(emb, "embedding", "vec_id", codebooks,
                                coarse, subs)
    assert idx.columns == ["vec_id", "codes", "cell", "route"]
    path = str(tmp_path / "pqhier")
    ivf.write_cell_index(idx, path, partition_col="route")
    stored = ivf.read_cell_index(spark, path, partition_col="route")
    queries = emb.where(F.col("vec_id").isin(QIDS))

    # (a) plan pins on a partial probe
    part = pq.pq_topk_index_hier(stored, queries, "embedding", "vec_id",
                                 K, codebooks, coarse, subs,
                                 n_probes=3, route_probes=2)
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "In(cell" in plan, plan
    pf = plan[plan.index("PartitionFilters"):][:400]
    assert "route" in pf, pf
    assert "CartesianProduct" not in plan

    # (b) probe-everything parity with the flat in-memory face
    n_cells = sum(len(r["cb"]) for r in subs.collect())
    full = pq.pq_topk_index_hier(stored, queries, "embedding", "vec_id",
                                 K, codebooks, coarse, subs,
                                 n_probes=n_cells,
                                 route_probes=len(coarse))
    mem = pq.pq_topk(emb, "embedding", "vec_id", QIDS, K, m=M,
                     codebooks=codebooks, coarse_centroids=coarse,
                     n_probes=len(coarse))
    canon = lambda df: {(int(r.query_id), int(r.neighbor_id),
                         round(float(r.adc), 9), int(r.rank))
                        for r in df.collect()}
    assert canon(full) == canon(mem)

    # (c) partial-probe adc values agree with the all-probe scoring
    all_adc = {(int(r.query_id), int(r.neighbor_id)): round(float(r.adc), 9)
               for r in full.collect()}
    for r in part.collect():
        key = (int(r.query_id), int(r.neighbor_id))
        if key in all_adc:
            assert round(float(r.adc), 9) == all_adc[key]

    # (b2) the cell-sorted layout (write_cell_index sort_within) returns
    # identical rows — layout is a pruning lever, never a semantics one
    path2 = str(tmp_path / "pqhier_sorted")
    ivf.write_cell_index(idx, path2, partition_col="route",
                         sort_within=("cell",))
    sorted_store = ivf.read_cell_index(spark, path2, partition_col="route")
    full2 = pq.pq_topk_index_hier(sorted_store, queries, "embedding",
                                  "vec_id", K, codebooks, coarse, subs,
                                  n_probes=n_cells,
                                  route_probes=len(coarse))
    assert canon(full2) == canon(mem)

    # (d) a route_probes>1 STORE keeps (query, neighbor) unique
    idx2 = pq.pq_cell_index_hier(emb, "embedding", "vec_id", codebooks,
                                 coarse, subs, route_probes=2)
    got = pq.pq_topk_index_hier(idx2, queries, "embedding", "vec_id",
                                K, codebooks, coarse, subs,
                                n_probes=8, route_probes=2).toPandas()
    assert not got.duplicated(["query_id", "neighbor_id"]).any()
    assert (got.groupby("query_id")["rank"].max() <= K).all()


def test_join_probe_face_matches_collect_face(spark, emb, codebooks):
    """The distributed probe face (broadcast_queries=False — round-11
    verdict ask #4): probe selection as DataFrame ops + a (route, cell)
    equi-join must return EXACTLY the collect face's rows — on a
    route_probes=1 store, a route_probes=2 store (the per-pair min-adc
    reduce), partial probes, and probe-everything — under BOTH probe
    kernels (the r14 "np" Arrow selection kernel, the default, and the
    r12 "expr" broadcast-join + HOF face) — and its plan must contain no
    driver-derived static IN lists (the whole point: nothing in it
    depends on collecting the query batch)."""
    from relationaldecomposition_spark.operators import ivf

    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", coarse, 4,
                             kernel="gram")
    queries = emb.where(F.col("vec_id").isin(QIDS))
    canon = lambda df: {(int(r.query_id), int(r.neighbor_id),
                         round(float(r.adc), 9), int(r.rank))
                        for r in df.collect()}
    n_cells = sum(len(r["cb"]) for r in subs.collect())
    for store_probes in (1, 2):
        idx = pq.pq_cell_index_hier(emb, "embedding", "vec_id", codebooks,
                                    coarse, subs,
                                    route_probes=store_probes)
        for np_, rp in ((3, 2), (n_cells, len(coarse))):
            a = pq.pq_topk_index_hier(idx, queries, "embedding", "vec_id",
                                      K, codebooks, coarse, subs,
                                      n_probes=np_, route_probes=rp)
            for kern in ("expr", "np"):
                b = pq.pq_topk_index_hier(idx, queries, "embedding",
                                          "vec_id", K, codebooks, coarse,
                                          subs, n_probes=np_,
                                          route_probes=rp,
                                          broadcast_queries=False,
                                          probe_kernel=kern)
                assert canon(a) == canon(b), (store_probes, np_, rp, kern)
                # plan shape checks on EVERY kernel face (ADVICE r14: the
                # former last-frame-only check silently dropped the r12
                # plan guarantee for the expr face)
                plan = b._jdf.queryExecution().executedPlan().toString()
                assert "CartesianProduct" not in plan, kern
                # the collect face's static pruning predicates must NOT
                # appear — this face is defined by not knowing the probe
                # set driver-side
                assert "cell IN" not in plan and "In(cell" not in plan, kern


def test_hier_probe_frame_matches_driver_selection(spark, emb, emb_np,
                                                   codebooks):
    """The r13 row-local rewrite of _hier_probe_frame: (query_id, route,
    cell) triples must equal _hier_query_probes' driver-side selection
    exactly (same global top-n_probes, same (d, route, cell) tie-break),
    with ZERO shuffle exchanges on the query side — the rewrite's point:
    route_probes broadcast joins + a row-local flatten/sort/slice replace
    the former groupBy(query_id)."""
    from relationaldecomposition_spark.operators import ivf

    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)
    # materialize the sub-codebook (the o77 production shape — it is a
    # persisted build-time artifact) so the plan assertion below sees the
    # PROBE path only, not the codebook build's own aggregation
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", coarse, 4,
                             kernel="gram").localCheckpoint(eager=True)
    q = (emb.where(F.col("vec_id").isin(QIDS))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").cast("array<double>").alias("qv")))
    frame = pq._hier_probe_frame(q, codebooks, coarse, subs,
                                 n_probes=3, route_probes=2)
    got = [(int(r["query_id"]), int(r["route"]), int(r["cell"]))
           for r in frame.collect()]
    qrows = [(i, list(emb_np[i])) for i in sorted(QIDS)]
    exp = pq._hier_query_probes(qrows, coarse, pq._collect_subs(subs),
                                3, 2)
    assert sorted(got) == sorted(exp)
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_hier_query_probes_matches_bruteforce(emb, emb_np):
    """The driver-side probe selection (_hier_query_probes) against an
    independent brute-force replay: for each query, the n_probes
    globally-nearest (route, cell) pairs among its route_probes nearest
    routes, ties (distance, route, cell) ascending."""
    from relationaldecomposition_spark.operators import ivf

    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", coarse, 4,
                             kernel="gram")
    subs_map = pq._collect_subs(subs)
    qrows = [(q, list(emb_np[q])) for q in QIDS]
    got = pq._hier_query_probes(qrows, coarse, subs_map, 3, 2)

    cents = sorted(coarse)
    exp = []
    for qid, qv in qrows:
        q = np.asarray(qv, dtype=np.float64)
        routes = sorted(
            ((float(((q - np.asarray(cv)) ** 2).sum()), cid)
             for cid, cv in cents))[:2]
        cand = sorted(
            (float(((q - np.asarray(cv)) ** 2).sum()), r, cell)
            for _, r in routes for cell, cv in subs_map[r])
        exp.extend((qid, r, cell) for _, r, cell in cand[:3])
    assert got == exp


def test_hier_query_probes_random_geometries():
    """Property sweep for the VECTORIZED probe selection (round 12): the
    chunked-numpy path must equal a per-query pure-python replay across
    random geometries, including the edges the loop form never had —
    ragged sub-codebooks (routes with different cell counts), probed
    routes MISSING from the codebook entirely, n_probes past the
    available cells, and route_probes = all routes. Seeded RNG (the
    suite's bounded-hypothesis pattern)."""
    rng = np.random.default_rng(20261212)
    for trial in range(20):
        dim = int(rng.integers(2, 9))
        nr = int(rng.integers(1, 6))
        coarse = [(int(rng.integers(0, 1000)) * 7 + i,
                   list(rng.normal(size=dim)))
                  for i in range(nr)]
        subs_map = {}
        for cid, _ in coarse:
            k2 = int(rng.integers(0, 5))
            if k2 == 0 and rng.random() < 0.5:
                continue  # route absent from the codebook entirely
            subs_map[cid] = [(int(rng.integers(0, 10000)) * 11 + j,
                              list(rng.normal(size=dim)))
                             for j in range(k2)]
        nq = int(rng.integers(1, 30))
        qrows = [(q, list(rng.normal(size=dim))) for q in range(nq)]
        n_probes = int(rng.integers(1, 8))
        route_probes = int(rng.integers(1, nr + 1))

        got = pq._hier_query_probes(qrows, coarse, subs_map, n_probes,
                                    route_probes)

        cents = sorted(coarse)
        exp = []
        for qid, qv in qrows:
            q = np.asarray(qv, dtype=np.float64)
            routes = sorted(
                ((float(((q - np.asarray(cv)) ** 2).sum()), cid)
                 for cid, cv in cents))[:route_probes]
            cand = sorted(
                (float(((q - np.asarray(cv)) ** 2).sum()), r, cell)
                for _, r in routes for cell, cv in subs_map.get(r, []))
            exp.extend((qid, r, cell) for _, r, cell in cand[:n_probes])
        assert got == exp, (trial, dim, nr, n_probes, route_probes)


def test_select_probes_route_probes_exceed_coarse():
    """ADVICE r14 regression: route_probes > len(coarse) with n_probes >
    nr*k2max must return the partial probe set (every existing cell, at
    most nr routes), not raise — the pre-r14 per-row loop clipped via nv;
    the vectorized refactor sized ro/co from route_probes alone and the
    chunk assignment raised a broadcast ValueError. Covers both callers
    (the collect face's _hier_query_probes and, transitively, the np
    probe kernel — both route through _select_probes)."""
    rng = np.random.default_rng(7)
    dim = 3
    coarse = [(i * 10, list(rng.normal(size=dim))) for i in range(2)]
    subs_map = {0: [(1, list(rng.normal(size=dim))),
                    (2, list(rng.normal(size=dim)))],
                10: [(11, list(rng.normal(size=dim)))]}
    qrows = [(q, list(rng.normal(size=dim))) for q in range(5)]
    # route_probes=4 > nr=2; n_probes=8 > nr*k2max=4 — the crash geometry
    got = pq._hier_query_probes(qrows, coarse, subs_map, 8, 4)
    cents = sorted(coarse)
    exp = []
    for qid, qv in qrows:
        q = np.asarray(qv, dtype=np.float64)
        routes = sorted(((float(((q - np.asarray(cv)) ** 2).sum()), cid)
                         for cid, cv in cents))[:4]
        cand = sorted((float(((q - np.asarray(cv)) ** 2).sum()), r, cell)
                      for _, r in routes for cell, cv in subs_map.get(r, []))
        exp.extend((qid, r, cell) for _, r, cell in cand[:8])
    assert got == exp


def test_hier_store_lifecycle_append_compact_probe(spark, emb, codebooks,
                                                   tmp_path):
    """The o74 lifecycle on the ROUTE-partitioned PQ store: build from
    half the corpus, append the rest in batches (same codebooks — the
    continuous-ingest contract), compact with partition_col='route',
    then probe: rows survive byte-identical, per-route file counts are
    bounded, and the probe equals a single-shot index over the full
    corpus."""
    from relationaldecomposition_spark.operators import ivf

    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", coarse, 4,
                             kernel="gram")
    path = str(tmp_path / "pqhier_life")
    base = emb.where(F.col("vec_id") % 3 == 0)
    ivf.write_cell_index(
        pq.pq_cell_index_hier(base, "embedding", "vec_id", codebooks,
                              coarse, subs),
        path, partition_col="route")
    for m in (1, 2):
        batch = emb.where(F.col("vec_id") % 3 == m)
        ivf.write_cell_index(
            pq.pq_cell_index_hier(batch, "embedding", "vec_id", codebooks,
                                  coarse, subs),
            path, partition_col="route", mode="append")
    res = ivf.compact_cell_index(spark, path, partition_col="route",
                                 max_files_per_cell=1)
    assert res["compacted_cells"] > 0
    stats = ivf.cell_store_file_stats(spark, path, partition_col="route")
    assert max(n for n, _ in stats.values()) == 1

    stored = ivf.read_cell_index(spark, path, partition_col="route")
    oneshot = pq.pq_cell_index_hier(emb, "embedding", "vec_id", codebooks,
                                    coarse, subs)
    canon = lambda df: {(int(r.vec_id), tuple(r.codes), int(r.cell),
                         int(r.route)) for r in df.collect()}
    assert canon(stored) == canon(oneshot)

    queries = emb.where(F.col("vec_id").isin(QIDS))
    disk = pq.pq_topk_index_hier(stored, queries, "embedding", "vec_id",
                                 K, codebooks, coarse, subs,
                                 n_probes=4, route_probes=2)
    mem = pq.pq_topk_index_hier(oneshot, queries, "embedding", "vec_id",
                                K, codebooks, coarse, subs,
                                n_probes=4, route_probes=2)
    c = lambda df: {(int(r.query_id), int(r.neighbor_id),
                     round(float(r.adc), 9), int(r.rank))
                    for r in df.collect()}
    assert c(disk) == c(mem)

    # IVFADC-R composes with the hier store: exact re-rank of a deep
    # hier-probe shortlist keeps the (query_id, neighbor_id, cosine,
    # rank) contract and one row per rank
    short = pq.pq_topk_index_hier(stored, queries, "embedding", "vec_id",
                                  30, codebooks, coarse, subs,
                                  n_probes=8, route_probes=2)
    rr = pq.pq_rerank(short, emb, "embedding", "vec_id", K).toPandas()
    assert list(rr.columns) == ["query_id", "neighbor_id", "cosine",
                                "rank"]
    assert (rr.groupby("query_id")["rank"].max() <= K).all()
    assert not rr.duplicated(["query_id", "rank"]).any()


def test_width_guard_fails_loudly(spark, emb, codebooks):
    """A store encoded under a different M must raise, not NULL-pad the
    zip_with and rank garbage (NULL adc would sort first in the window)."""
    from relationaldecomposition_spark.operators import ivf

    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)
    idx = pq.pq_cell_index(emb, "embedding", "vec_id", codebooks, coarse)
    wrong_m = pq.pq_seed_codebooks(emb, "embedding", "vec_id", 4, CIDS)
    queries = emb.where(F.col("vec_id").isin(QIDS))
    bad = pq.pq_topk_index(idx, queries, "embedding", "vec_id", K,
                           wrong_m, coarse, n_probes=8)
    with pytest.raises(Exception, match="codebook geometry"):
        bad.collect()

    # same M, SMALLER K: a length-only width guard passes, element_at
    # then reads the LUT out of bounds -> NULL adc sorts first and ranks
    # garbage silently. The guard must also check code VALUE bounds.
    # (the store was encoded with K=len(CIDS) codes; query it with
    # codebooks truncated to K=2 entries per subspace)
    wrong_k = [cb[:2] for cb in codebooks]
    bad_k = pq.pq_topk_index(idx, queries, "embedding", "vec_id", K,
                             wrong_k, coarse, n_probes=8)
    with pytest.raises(Exception, match="codebook"):
        bad_k.collect()

    with pytest.raises(ValueError, match="distinct"):
        pq.pq_seed_codebooks(emb, "embedding", "vec_id", M, CIDS + [CIDS[0]])


def test_geometry_guard_on_encode(spark, emb, codebooks):
    """A codebook wider than the data must raise on BOTH encode kernels,
    not NULL-pad F.slice/zip_with and assign a wrong code silently."""
    short = emb.select("vec_id",
                       F.slice("embedding", 1, 32).alias("embedding"))
    for kernel in ("expr", "np"):
        with pytest.raises(Exception, match="vector width"):
            pq.pq_encode(short, "embedding", "vec_id", codebooks,
                         kernel=kernel).collect()


def test_null_vector_propagates_null_codes(spark, codebooks):
    """ADVICE r11: a NULL vector row (e.g. from an outer join) must come
    out of the expression encode as NULL codes — the pre-guard semantics —
    not die inside the geometry guard's raise_error with a message that is
    itself NULL (size(NULL) made both the when-condition and the concat'd
    message NULL)."""
    dim = M * len(codebooks[0][0])
    rows = [(1, [0.5] * dim), (2, None)]
    df = spark.createDataFrame(rows, f"vec_id long, embedding array<double>")
    for kernel in ("expr", "np"):  # kernel PARITY on the NULL edge
        got = {r["vec_id"]: r["codes"]
               for r in pq.pq_encode(df, "embedding", "vec_id", codebooks,
                                     kernel=kernel).collect()}
        assert got[2] is None, kernel
        assert got[1] is not None and len(got[1]) == M, kernel


def test_null_vector_null_cell_np_hier(spark, codebooks):
    """The np kernel's coarse face (used by the hier encode) must give a
    NULL cell — not a crash — for a NULL vector, and the all-NULL batch
    edge must survive (no rows reach the matmul)."""
    from relationaldecomposition_spark.operators import ivf
    from relationaldecomposition_spark.operators.pq import _np_encoded

    dim = M * len(codebooks[0][0])
    rows = [(1, [0.5] * dim), (2, None), (3, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    coarse = [(7, [0.0] * dim), (9, [1.0] * dim)]
    got = {r["vec_id"]: (r["codes"], r["cell"])
           for r in _np_encoded(df, "embedding", "vec_id", codebooks,
                                coarse=coarse).collect()}
    assert got[2] == (None, None) and got[3] == (None, None)
    codes1, cell1 = got[1]
    assert len(codes1) == M and cell1 in (7, 9)
    # all-NULL frame: every output row NULL, no matmul crash
    all_null = df.where(F.col("vec_id") > 1)
    out = _np_encoded(all_null, "embedding", "vec_id", codebooks,
                      coarse=coarse).collect()
    assert [(r["codes"], r["cell"]) for r in out] == [(None, None)] * 2


def test_m_codebooks_conflict(emb, codebooks):
    """An explicit m that disagrees with provided codebooks fails loudly
    instead of len(codebooks) silently overriding it."""
    with pytest.raises(ValueError, match="conflicts"):
        pq.pq_topk(emb, "embedding", "vec_id", QIDS, K, m=M + 1,
                   codebooks=codebooks, coarse_centroid_ids=CIDS)


def test_np_encode_prunes_raw_vector(emb, codebooks):
    """Encode-only BLAS outputs carry no raw-vector column: each row's D
    doubles must not ride back through Arrow just to be dropped."""
    enc = pq.pq_encode(emb, "embedding", "vec_id", codebooks, kernel="np")
    assert enc.columns == ["vec_id", "codes"]
    from relationaldecomposition_spark.operators import ivf
    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", CIDS)
    idx = pq.pq_cell_index(emb, "embedding", "vec_id", codebooks, coarse)
    assert idx.columns == ["vec_id", "codes", "cell"]


def test_random_geometries_match_python_oracle(spark):
    """Seeded-RNG property sweep (the suite's bounded hypothesis pattern):
    random corpora across degenerate-to-o76 geometries — m=1 (whole-vector
    quantization), K=2 (binary codes), k past the candidate count,
    single-probe — each compared row-exactly against a pure-python replay
    of seed slicing, coarse probing, encoding, ADC, and ranking."""
    import random

    from pyspark.sql import Row

    rng = random.Random(20260816)
    cases = [  # (m, n_seeds, dim, n_rows, k, n_probes)
        (1, 2, 8, 25, 3, 2),
        (2, 4, 8, 30, 5, 1),
        (4, 3, 16, 40, 50, 3),
        (8, 5, 64, 35, 4, 5),
    ]
    for m, n_seeds, dim, n, k, n_probes in cases:
        vecs = {i: [round(rng.uniform(-1, 1), 6) for _ in range(dim)]
                for i in range(n)}
        seed_ids = rng.sample(sorted(vecs), n_seeds)
        qids = rng.sample(sorted(vecs), 3)
        df = spark.createDataFrame(
            [Row(vid=i, emb=v) for i, v in vecs.items()])

        got = pq.pq_topk(df, "emb", "vid", qids, k, m=m,
                         code_ids=seed_ids, coarse_centroid_ids=seed_ids,
                         n_probes=n_probes)
        got_set = {(int(r.query_id), int(r.neighbor_id),
                    round(float(r.adc), 9), int(r.rank))
                   for r in got.collect()}

        # pure-python replay
        sub = dim // m
        np_v = {i: np.asarray(v, dtype=np.float64)
                for i, v in vecs.items()}
        cbs = [[np_v[c][s * sub:(s + 1) * sub] for c in seed_ids]
               for s in range(m)]
        cents = [(c, np_v[c]) for c in seed_ids]

        def probe(v, p):
            ranked = sorted(cents, key=lambda t: (
                float(np.sum((v - t[1]) ** 2)), t[0]))
            return [t[0] for t in ranked[:p]]

        assign = {i: probe(v, 1)[0] for i, v in np_v.items()}
        codes = {i: [min(range(len(cb)), key=lambda j: (
            float(np.sum((v[s * sub:(s + 1) * sub] - cb[j]) ** 2)), j))
            for s, cb in enumerate(cbs)] for i, v in np_v.items()}
        want = set()
        for q in qids:
            cells = set(probe(np_v[q], n_probes))
            cand = [i for i, c in assign.items() if c in cells and i != q]
            scored = sorted((sum(
                float(np.sum((np_v[q][s * sub:(s + 1) * sub]
                              - cbs[s][c]) ** 2))
                for s, c in enumerate(codes[i])), i) for i in cand)
            for rank, (adc, i) in enumerate(scored[:k], start=1):
                want.add((q, i, round(adc, 9), rank))
        assert got_set == want, (m, n_seeds, dim, n, k, n_probes)
