"""ANN quality pins on PLANTED TWO-LEVEL geometry
(sources/synthetic.hierarchical_embeddings — round-11 verdict ask #5).
The flat clustered fixture couldn't show the hier router's failure mode;
this one plants clusters-of-clusters, where coarse routing makes real
mistakes at route boundaries. The pinned story (measured at CI scale,
exact reruns of a deterministic fixture, margins for BLAS ulp only —
measured p1 0.2666 / p2 0.7052 / p3 0.9519 / flat16 0.3872, PQ same-label
precision 0.96; the 10k-row sweep is SCALING.json manifold_quality_r12):

- single-probe hier routing UNDERPERFORMS flat at equal cells — route
  mistakes split near-dup pairs that flat cells keep together;
- route_probes=2 recovers them and beats flat decisively; p=3 nears 1.

i.e. on hierarchical corpora multi-probe is a requirement, not a tuning
nicety."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from relationaldecomposition_spark.operators import ivf, pq
from relationaldecomposition_spark.sources.synthetic import (
    hierarchical_embeddings)

ROWS, DIM, ROUTES, SUBS = 800, 32, 4, 4
TAU = 0.45
K1_IDS = list(range(0, ROWS, ROWS // ROUTES))          # 4 coarse seeds
FLAT_IDS = list(range(0, ROWS, ROWS // (ROUTES * SUBS)))  # 16 flat cells


@pytest.fixture(scope="module")
def emb(spark):
    return hierarchical_embeddings(spark, ROWS, dim=DIM, routes=ROUTES,
                                   subs_per_route=SUBS).persist()


@pytest.fixture(scope="module")
def geo(emb):
    pdf = emb.toPandas()
    ids = pdf.vec_id.to_numpy()
    vecs = np.array([np.asarray(v, dtype=np.float64)
                     for v in pdf.embedding])
    cos = vecs @ vecs.T
    iu = np.triu_indices(len(ids), 1)
    mask = cos[iu] >= TAU
    pairs = list(zip(iu[0][mask], iu[1][mask]))
    labels = dict(zip(pdf.vec_id.astype(int), pdf.label.astype(int)))
    rlabels = dict(zip(pdf.vec_id.astype(int),
                       pdf.route_label.astype(int)))
    return ids, vecs, cos, pairs, labels, rlabels


def test_generator_contract(spark, emb, geo):
    ids, vecs, cos, pairs, labels, rlabels = geo
    assert len(ids) == ROWS
    assert np.allclose((vecs * vecs).sum(1), 1.0, atol=1e-6)
    # planted two-level separation: within-sub > within-route > cross
    lab = np.array([labels[int(i)] for i in ids])
    rl = np.array([rlabels[int(i)] for i in ids])
    iu = np.triu_indices(len(ids), 1)
    same_sub = lab[iu[0]] == lab[iu[1]]
    same_route = (rl[iu[0]] == rl[iu[1]]) & ~same_sub
    cross = rl[iu[0]] != rl[iu[1]]
    ws, wr, cr = (cos[iu][same_sub].mean(), cos[iu][same_route].mean(),
                  cos[iu][cross].mean())
    assert ws > wr > 0.15, (ws, wr)
    assert abs(cr) < 0.1, cr
    # partition invariance: value is a pure function of vec_id
    re = hierarchical_embeddings(spark, ROWS, dim=DIM, routes=ROUTES,
                                 subs_per_route=SUBS).repartition(7)
    a = {(int(r.vec_id), tuple(r.embedding), int(r.label))
         for r in emb.collect()}
    b = {(int(r.vec_id), tuple(r.embedding), int(r.label))
         for r in re.collect()}
    assert a == b


def _recall(assigned, ids, pairs):
    cells = {}
    for r in assigned.select("vec_id", "route", "cell").collect():
        cells.setdefault(int(r.vec_id), set()).add(
            (int(r.route), int(r.cell)))
    return sum(1 for a, b in pairs
               if cells[int(ids[a])] & cells[int(ids[b])]) / len(pairs)


def test_multiprobe_is_required_on_hierarchical_geometry(emb, geo):
    """The headline: p1 LOSES to flat-at-equal-cells (route mistakes),
    p2 recovers and beats flat >=1.5x, p3 nears full recall."""
    ids, vecs, cos, pairs, labels, rlabels = geo
    assert len(pairs) > 1000
    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", K1_IDS)
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", coarse, SUBS,
                             kernel="gram")
    r = {p: _recall(ivf._np_assign_with_subs(
            emb, "embedding", "vec_id", coarse, subs, route_probes=p),
            ids, pairs) for p in (1, 2, 3)}
    flat_cents = ivf.seed_centroids(emb, "embedding", "vec_id", FLAT_IDS)
    rf = _recall(ivf._np_assigned(emb, "embedding", "vec_id", flat_cents)
                 .select("vec_id", F.lit(0).alias("route"), "cell"),
                 ids, pairs)
    assert r[1] < rf, (r[1], rf)          # single-probe hier loses
    assert r[2] >= 1.5 * rf, (r[2], rf)   # measured 0.705 vs 0.387
    assert r[3] > r[2] > r[1], r
    assert r[3] >= 0.9, r[3]              # measured 0.9519


def test_pq_store_probe_needs_route_multiprobe(spark, emb, tmp_path):
    """The o77 store-probe twin of the headline (r12 verdict ask #6,
    measured at 10k rows in SCALING.json pq_store_manifold_r13): on
    hierarchical geometry, route_probes=1 PLATEAUS below full probe
    recall no matter how many sub-cells are probed (the lost neighbors
    live in un-probed ROUTES), while route_probes=2 recovers most of it.
    Protocol: pq_cell_index_hier -> route-partitioned store round-trip ->
    pq_topk_index_hier; recall vs the probe-everything ADC top-k."""
    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", K1_IDS)
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", coarse, SUBS,
                             kernel="gram").localCheckpoint(eager=True)
    cbs = pq.pq_seed_codebooks(emb, "embedding", "vec_id", 8, FLAT_IDS)
    store = str(tmp_path / "manifold_store")
    ivf.write_cell_index(
        pq.pq_cell_index_hier(emb, "embedding", "vec_id", cbs, coarse,
                              subs),
        store, partition_col="route", sort_within=("cell",))
    stored = ivf.read_cell_index(spark, store, partition_col="route")
    queries = emb.where(F.col("vec_id") < 20)

    def topk(n_probes, route_probes):
        got = pq.pq_topk_index_hier(stored, queries, "embedding",
                                    "vec_id", 10, cbs, coarse, subs,
                                    n_probes=n_probes,
                                    route_probes=route_probes).collect()
        out = {}
        for r in got:
            out.setdefault(int(r["query_id"]), set()).add(
                int(r["neighbor_id"]))
        return out

    full = topk(ROUTES * SUBS, ROUTES)
    denom = sum(len(v) for v in full.values())

    def recall(got):
        return sum(len(full[q] & got.get(q, set())) for q in full) / denom

    # rp1 plateau: all sub-cells of ONE route cannot beat its ceiling
    r1_all = recall(topk(SUBS, 1))
    r1_more = recall(topk(ROUTES * SUBS, 1))
    assert r1_more <= r1_all + 1e-9, (r1_all, r1_more)
    # two routes at the SAME total cell budget as the rp1 ceiling probe
    # (2*SUBS cells) must beat the ceiling — the lost neighbors are in
    # the second route (measured 0.92 vs 0.815 at CI scale; the 10k
    # sweep's gap is wider, 0.925 vs 0.765)
    r2 = recall(topk(2 * SUBS, 2))
    assert r1_all < 0.9, r1_all           # the single-route ceiling bites
    assert r2 > r1_all + 0.05, (r2, r1_all)


def test_pq_routes_to_true_component_on_manifold(emb, geo):
    """ADC top-10 stays within the query's planted component on the
    hierarchical fixture too (measured 0.96; pinned 0.85)."""
    ids, vecs, cos, pairs, labels, rlabels = geo
    flat_cents = ivf.seed_centroids(emb, "embedding", "vec_id", FLAT_IDS)
    cbs = pq.pq_seed_codebooks(emb, "embedding", "vec_id", 8, FLAT_IDS)
    got = pq.pq_topk(emb, "embedding", "vec_id", list(range(10)), 10,
                     m=8, codebooks=cbs, coarse_centroids=flat_cents,
                     n_probes=len(flat_cents), kernel="np").toPandas()
    hits = sum(labels[int(r.neighbor_id)] == labels[int(r.query_id)]
               for r in got.itertuples())
    assert hits / len(got) >= 0.85, hits / len(got)
