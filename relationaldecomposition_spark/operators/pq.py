"""Product quantization (PQ) with asymmetric-distance ranking — the memory/
IO face of ANN at corpus scale (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011, §II-III). `operators/ivf.py` holds the
coarse quantizer the same paper builds IVFADC from; this module adds the
fine quantizer and the ADC scorer, completing the IVF-PQ pair.

The idea: split each dim-D vector into M contiguous subvectors, quantize
each subvector against its own K-entry sub-codebook, and store only the M
code indices per row. Ranking is ASYMMETRIC: the query stays exact — per
query, precompute a lookup table LUT[s][j] = ||q_s − c_{s,j}||² (M·K
doubles, codebook-sized), and a candidate's approximate distance is the sum
over subspaces of LUT[s][code_s] — M array lookups and adds per candidate,
never a D-dim dot product.

Why this is the 100 TB path:

- **Codes are tiny.** 64-dim float32 rows (256 B) become M=8 one-byte
  codes — a 32× smaller scan for the ranking pass. At 100 TB of raw
  embeddings the encoded table is ~3 TB; re-ranking reads raw vectors for
  only the few candidates that survive ADC.
- **Everything data-sized is map-only.** Encoding is one projection per
  row (argmin over K per subspace); ADC is one expression over (codes,
  broadcast LUT). The only shuffle is the coarse-cell candidate equi-join
  inherited from `ivf.ivf_topk` — same plan shape, smaller payload.
- **Codebooks are driver constants.** M·K·(D/M) = K·D floats total —
  exactly the size of the coarse codebook — embedded as plan literals
  (oracle face) or riding a mapInPandas closure (BLAS face).

Determinism contract (the DuckDB twin in operators/registry.py replays
every stage): sub-codebooks are seed-row slices (code id = position in the
seed id list), per-subspace argmin tie-breaks on (distance, code), distance
sums run left-to-right over ascending dimension, and the cross-subspace ADC
sum runs left-to-right over ascending subspace — the same float-summation
alignment `ivf._dist_structs` documents against DuckDB's `list_sum`.
Optional Lloyd refinement (`lloyd_iters > 0`) trades that bit-stability for
codebook quality, mirroring `ivf.lloyd_refine`'s contract.

Reference map: the reference engine has no ANN surface — this module is
part of the LLM-pipeline plane built beside it (see ivf.py header).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from . import ivf
from .ivf import _as_double, seed_centroids


def _check_geometry(dim: int, m: int) -> int:
    if m < 1 or dim % m:
        raise ValueError(f"m={m} must divide the vector width {dim}")
    return dim // m


def pq_seed_codebooks(df: DataFrame, vec_col: str, id_col: str, m: int,
                      code_ids: list[int]) -> list[list[list[float]]]:
    """Sub-codebooks from fixed seed rows: codebooks[s][j] is the s-th
    subvector of the j-th seed row, so code j is the POSITION in
    `code_ids` (positional codes keep the LUT an array lookup and align
    both engines' tie-breaks). One codebook-sized collect, shared with the
    coarse quantizer when the same seeds serve both roles."""
    if len(set(code_ids)) != len(code_ids):
        raise ValueError("code_ids must be distinct (duplicate seeds would "
                         "alias codes and skew every tie-break)")
    seeds = seed_centroids(df, vec_col, id_col, code_ids)
    dim = len(seeds[0][1])
    sub = _check_geometry(dim, m)
    return [[v[s * sub:(s + 1) * sub] for _, v in seeds] for s in range(m)]


def _code_structs(vname: str, s: int, sub: int,
                  codebook_s: list[list[float]]) -> Column:
    """array<struct<d: double, j: int>> for subspace s, sorted ascending by
    (distance, code) — the per-subspace twin of ivf._dist_structs, with the
    same construction split: the sub-codebook is ONE parsed literal, the
    distance lambdas are API-built (see ivf._dist_structs for the
    self-join-safety bug this avoids)."""
    cents = F.expr("array(" + ",".join(
        f"named_struct('j', {int(j)}, 'cv', "
        f"array({','.join(repr(float(x)) + 'D' for x in cv)}))"
        for j, cv in enumerate(codebook_s)) + ")")
    v = F.slice(F.col(vname), s * sub + 1, sub)
    return F.array_sort(F.transform(cents, lambda c: F.struct(
        F.aggregate(F.zip_with(v, c["cv"], lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda a, b: a + b).alias("d"),
        c["j"].alias("j"))))


def _codes_expr(vname: str, codebooks: list[list[list[float]]]) -> Column:
    m = len(codebooks)
    sub = len(codebooks[0][0])
    codes = F.array(*[
        F.element_at(_code_structs(vname, s, sub, cb), 1)["j"]
        for s, cb in enumerate(codebooks)])
    # geometry guard: a codebook wider than the data makes F.slice return
    # short subvectors and zip_with NULL-pad the distance — struct
    # comparison then treats NULL as smallest and assigns a wrong code
    # SILENTLY. Fail loudly on any row whose width is not m*sub. A NULL
    # vector propagates NULL codes (the pre-guard semantics, e.g. from an
    # outer join): without the explicit branch, size(NULL) = NULL makes
    # the when-condition fall through to raise_error whose concat'd
    # message is ITSELF NULL — an unreadable failure (ADVICE r11).
    return F.when(F.col(vname).isNull(),
                  F.lit(None).cast("array<int>")).when(
        F.size(F.col(vname)) == F.lit(m * sub), codes
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"PQ codebook geometry (m={m}, sub={sub}) does not match "
              "the vector width "),
        F.size(F.col(vname)).cast("string")))).alias("codes")


def pq_encode(df: DataFrame, vec_col: str, id_col: str,
              codebooks: list[list[list[float]]],
              kernel: str = "expr") -> DataFrame:
    """(id, codes: array<int>): per-subspace nearest-code assignment as a
    map-only pass. ``kernel="expr"`` is the literal-codebook oracle face;
    ``kernel="np"`` the BLAS face (one mapInPandas, fused multiply-add per
    centroid visit — the production face once K·D outgrows interpreted-HOF
    economics, same split as ivf.ivf_topk's kernels)."""
    if kernel == "np":
        return _np_encoded(df, vec_col, id_col, codebooks)
    if kernel != "expr":
        raise ValueError(f"unknown encode kernel: {kernel!r}")
    return (df.select(F.col(id_col), _as_double(vec_col).alias("_v"))
            .select(F.col(id_col), _codes_expr("_v", codebooks)))


def _np_encoded(df: DataFrame, vec_col: str, id_col: str,
                codebooks: list[list[list[float]]],
                coarse: list[tuple[int, list[float]]] | None = None,
                include_v: bool = False,
                carry: tuple[str, ...] = ()) -> DataFrame:
    """(id[, v], codes[, cell]): BLAS twin of the expression face — one
    mapInPandas pass computing every subspace argmin (and, when `coarse`
    is given, the full-dim coarse cell) per Arrow batch. Codes scan
    ascending-j with np.argmin's first-minimum rule, reproducing the
    expression path's (distance, j) tie-break up to the same ~ulp
    BLAS-vs-sequential caveat as ivf._np_assigned (pinned identical on the
    gate data by tests/test_pq.py). `include_v` keeps the raw vector in
    the output; encode-only callers leave it off so each row's D doubles
    are NOT serialized back through Arrow just to be pruned (column
    pruning cannot reach inside a Python UDF — the whole point of this
    pass is emitting M bytes per row, not D floats). ``carry`` names
    extra input columns passed through untouched (the hier face carries
    its (route, cell) assignment alongside the codes)."""
    import numpy as np

    from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                                   LongType, StructField, StructType)

    m = len(codebooks)
    sub = len(codebooks[0][0])
    cmats = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    c2s = [(c * c).sum(axis=1) for c in cmats]
    fields = [df.schema[id_col]]
    fields += [df.schema[c] for c in carry]
    if include_v:
        fields.append(StructField("v", ArrayType(DoubleType())))
    fields.append(StructField("codes", ArrayType(IntegerType())))
    if coarse is not None:
        ordered = sorted(coarse)
        ccids = np.array([c for c, _ in ordered], dtype=np.int64)
        ccmat = np.asarray([v for _, v in ordered], dtype=np.float64)
        cc2 = (ccmat * ccmat).sum(axis=1)
        fields.append(StructField("cell", LongType()))
    out = StructType(fields)

    def encode(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            # NULL vectors propagate NULL codes (and NULL v/cell) —
            # kernel parity with the expression face's explicit NULL
            # branch in _codes_expr (ADVICE r12: the np kernel used to
            # crash on a ragged asarray instead). Width errors stay loud
            # on the non-null rows, same message as the expr face.
            null = pdf[vec_col].isna().to_numpy()
            n = len(pdf)
            codes_full: list = [None] * n
            v_full: list = [None] * n
            cell_full: list = [None] * n
            nz = np.flatnonzero(~null)
            if len(nz):
                x = np.asarray([np.asarray(pdf[vec_col].iloc[i],
                                           dtype=np.float64) for i in nz])
                if x.ndim != 2 or x.shape[1] != m * sub:
                    width = "ragged" if x.ndim != 2 else x.shape[1]
                    raise ValueError(
                        f"PQ codebook geometry (m={m}, sub={sub}) does "
                        f"not match the vector width {width}")
                codes = np.empty((len(x), m), dtype=np.int32)
                for s in range(m):
                    xs = x[:, s * sub:(s + 1) * sub]
                    # argmin of |c|^2 - 2 x.c == argmin squared distance;
                    # np.argmin keeps the FIRST minimum -> lowest j on ties
                    codes[:, s] = np.argmin(
                        c2s[s] - 2.0 * (xs @ cmats[s].T), axis=1)
                if coarse is not None:
                    cells = ccids[np.argmin(cc2 - 2.0 * (x @ ccmat.T),
                                            axis=1)]
                for i, pos in enumerate(nz):
                    codes_full[pos] = codes[i]
                    if include_v:
                        v_full[pos] = x[i]
                    if coarse is not None:
                        cell_full[pos] = int(cells[i])
            cols = {id_col: pdf[id_col]}
            for c in carry:
                cols[c] = pdf[c]
            if include_v:
                cols["v"] = v_full
            cols["codes"] = codes_full
            if coarse is not None:
                cols["cell"] = pd.array(cell_full, dtype="Int64")
            yield pd.DataFrame(cols)

    return df.select(id_col, *carry, vec_col).mapInPandas(encode, out)


def pq_lloyd_refine(df: DataFrame, vec_col: str, id_col: str,
                    codebooks: list[list[list[float]]],
                    iters: int = 1) -> list[list[list[float]]]:
    """Per-subspace Lloyd iterations, fully distributed: encode (map-only,
    BLAS face) → posexplode (subspace, code, dim) → per-key mean (shuffle
    of m·K·sub = K·D rows, codebook-sized) → collect the new sub-codebooks.
    Empty codes keep their previous centroid. Same reproducibility caveat
    as ivf.lloyd_refine: F.avg sums in shuffle-arrival order, so refined
    codebooks are deterministic to ~ulp, not bit-stable — the lloyd_iters=0
    seed path is the oracle face."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    for _ in range(iters):
        enc = _np_encoded(df, vec_col, id_col, codebooks, include_v=True)
        means = (enc.select(F.posexplode("codes").alias("s", "j"), "v")
                 .select("s", "j",
                         F.posexplode(F.slice(
                             "v", F.col("s") * sub + 1, sub))
                         .alias("dim", "x"))
                 .groupBy("s", "j", "dim").agg(F.avg("x").alias("mn"))
                 .groupBy("s", "j")
                 .agg(F.array_sort(F.collect_list(F.struct("dim", "mn")))
                      .alias("dm"))
                 .select("s", "j",
                         F.transform("dm", lambda t: t["mn"]).alias("cv"))
                 .collect())
        new = {(r["s"], r["j"]): [float(x) for x in r["cv"]] for r in means}
        codebooks = [[new.get((s, j), cv) for j, cv in enumerate(cb)]
                     for s, cb in enumerate(codebooks)]
    return codebooks


def _lut_expr(qname: str, codebooks: list[list[list[float]]]) -> Column:
    """array<array<double>> — luts[s][j] = ||q_s − c_{s,j}||², the ADC
    lookup table as an expression over the query vector. Evaluated only on
    the query side (a handful of rows), so the interpreted HOF cost is
    irrelevant; what matters is that each entry's summation order matches
    the encode face and the DuckDB twin (ascending dim, left-to-right)."""
    sub = len(codebooks[0][0])

    def one(s: int, cb: list[list[float]]) -> Column:
        cents = F.expr("array(" + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in cv) + ")"
            for cv in cb) + ")")
        qs = F.slice(F.col(qname), s * sub + 1, sub)
        return F.transform(cents, lambda c: F.aggregate(
            F.zip_with(qs, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda a, b: a + b))

    return F.array(*[one(s, cb) for s, cb in enumerate(codebooks)])


def pq_topk(df: DataFrame, vec_col: str, id_col: str,
            query_ids: list[int], k: int = 5, m: int | None = None,
            code_ids: list[int] | None = None,
            codebooks: list[list[list[float]]] | None = None,
            coarse_centroid_ids: list[int] | None = None,
            coarse_centroids: list[tuple[int, list[float]]] | None = None,
            n_probes: int = 4, lloyd_iters: int = 0,
            kernel: str = "expr") -> DataFrame:
    """IVF-PQ (IVFADC) top-k: coarse-probe the n_probes nearest cells per
    query (exactly `ivf.ivf_topk`'s candidate stage), then rank candidates
    by asymmetric PQ distance instead of exact cosine — the scan-side
    payload drops from D floats to M codes. Returns (query_id, neighbor_id,
    adc, rank), rank ascending by (adc, neighbor_id); `adc` is the
    approximate squared L2 distance (smaller = nearer).

    Probing every cell (n_probes = n_cells) makes the candidate set exact,
    isolating pure PQ ranking quality — tests/test_pq.py pins both that
    recall floor and the parity of the two kernels. Pass `codebooks` /
    `coarse_centroids` to reuse trained artifacts across calls (the
    continuous-ingest shape); otherwise both derive from seed rows, with
    `lloyd_iters` refining the SUB-codebooks only (the coarse stage stays
    the caller's concern, as in ivf.ivf_topk)."""
    if codebooks is None:
        if not code_ids:
            raise ValueError("need code_ids or codebooks")
        codebooks = pq_seed_codebooks(df, vec_col, id_col,
                                      8 if m is None else m, code_ids)
        if lloyd_iters:
            codebooks = pq_lloyd_refine(df, vec_col, id_col, codebooks,
                                        lloyd_iters)
    elif m is not None and m != len(codebooks):
        # trained-artifact reuse must fail loudly on mismatch, not let
        # len(codebooks) silently override the caller's m
        raise ValueError(f"m={m} conflicts with the provided codebooks' "
                         f"M={len(codebooks)}")
    m = len(codebooks)
    if coarse_centroids is None:
        if not coarse_centroid_ids:
            raise ValueError("need coarse_centroid_ids or coarse_centroids")
        coarse_centroids = seed_centroids(df, vec_col, id_col,
                                          coarse_centroid_ids)
    if not 1 <= n_probes <= len(coarse_centroids):
        raise ValueError(f"n_probes must be in [1, {len(coarse_centroids)}]")

    base = df.select(F.col(id_col), _as_double(vec_col).alias("v"))
    if kernel == "np":
        data = _np_encoded(df, vec_col, id_col, codebooks,
                           coarse=coarse_centroids) \
            .select(id_col, "codes", "cell")
    elif kernel == "expr":
        data = base.select(
            F.col(id_col), _codes_expr("v", codebooks),
            F.element_at(ivf._dist_structs("v", coarse_centroids), 1)["cell"]
             .alias("cell"))
    else:
        raise ValueError(f"unknown assignment kernel: {kernel!r}")

    q = base.where(F.col(id_col).isin(query_ids)) \
            .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"))
    return _adc_rank(data, id_col, q, codebooks, coarse_centroids,
                     n_probes, k)


def _adc_expr(codebooks: list[list[list[float]]]) -> Column:
    """Guarded ADC score over (codes, luts): sum over subspaces of
    LUT[s][code_s], left-to-right ascending s. The guard checks BOTH axes
    of the codebook geometry: width (M — zip_with NULL-pads a mismatched
    codes array) and code RANGE (K — an index encoded under the same M but
    a LARGER K passes a length-only check, and element_at(lut, c+1) then
    returns NULL out-of-bounds under non-ANSI semantics). Either way a
    NULL adc would sort FIRST in the ascending rank window (or silently
    drop collisions on the stream face) — fail loudly instead."""
    m, k = len(codebooks), len(codebooks[0])
    ok = (
        (F.size(F.col("codes")) == F.lit(m))
        & F.forall(F.col("codes"),
                   lambda c: (c >= F.lit(0)) & (c < F.lit(k))))
    return F.when(
        ok,
        F.aggregate(
            F.zip_with(F.col("codes"), F.col("luts"),
                       lambda c, lut: F.element_at(lut, c + F.lit(1))),
            F.lit(0.0), lambda a, b: a + b)
    ).otherwise(F.raise_error(F.lit(
        f"PQ codes do not match the codebook geometry (M={m}, K={k}) — "
        "was this index encoded under a different codebook?")))


def _adc_rank(index: DataFrame, id_col: str, q: DataFrame,
              codebooks: list[list[list[float]]],
              coarse_centroids: list[tuple[int, list[float]]],
              n_probes: int, k: int) -> DataFrame:
    """ADC scoring over a probe-ready (id, codes, cell) index. `q` is the
    tiny (query_id, qv) frame; probes and LUTs are broadcast, so the cell
    equi-join against a `read_cell_index` store compiles to dynamic
    partition pruning — the scan reads only probed cells' files (pinned
    in tests/test_pq.py). One cell per index row + distinct probed cells
    per query -> candidates already unique (the ivf_topk invariant); ADC
    is M lookups + adds, summed left-to-right over ascending subspace."""
    qprobes = (q.select("query_id",
                        F.explode(F.slice(
                            ivf._dist_structs("qv", coarse_centroids),
                            1, n_probes)).alias("p"))
               .select("query_id", F.col("p.cell").alias("cell")))
    luts = q.select("query_id", _lut_expr("qv", codebooks).alias("luts"))
    adc = _adc_expr(codebooks)
    scored = (index.join(F.broadcast(qprobes), "cell")
              .where(F.col(id_col) != F.col("query_id"))
              .join(F.broadcast(luts), "query_id")
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      adc.alias("adc")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adc", "rank"))


def pq_cell_index(df: DataFrame, vec_col: str, id_col: str,
                  codebooks: list[list[list[float]]],
                  coarse_centroids: list[tuple[int, list[float]]]
                  ) -> DataFrame:
    """(id, codes, cell): the IVFADC index in its persistable form — what
    `ivf.write_cell_index` writes for the 100 TB regime. The store holds M
    small codes per row instead of the raw vector (the 32× scan shrink the
    module header derives), partitioned by coarse cell so probes prune to
    O(probed cells) files via DPP. One map-only BLAS pass; continuous
    ingest encodes each batch against the SAME persisted codebooks
    (constants, like the coarse codebook in semdedup_incremental) and
    appends with mode="append" + compact_cell_index, exactly the o74
    lifecycle."""
    return _np_encoded(df, vec_col, id_col, codebooks,
                       coarse=coarse_centroids).select(id_col, "codes",
                                                       "cell")


def pq_topk_index(index: DataFrame, queries: DataFrame, vec_col: str,
                  id_col: str, k: int,
                  codebooks: list[list[list[float]]],
                  coarse_centroids: list[tuple[int, list[float]]],
                  n_probes: int = 4) -> DataFrame:
    """pq_topk against a prebuilt (id, codes, cell) index — typically
    `ivf.read_cell_index` over a `pq_cell_index` store — and an explicit
    (id, vector) query frame. The probe equi-join on the partition column
    compiles to dynamic partition pruning on the store scan (plan-pinned
    in tests/test_pq.py), so a query batch physically reads only its
    probed cells no matter how large the store grows; parity with the
    in-memory pq_topk is pinned on the gate data."""
    if not 1 <= n_probes <= len(coarse_centroids):
        raise ValueError(f"n_probes must be in [1, {len(coarse_centroids)}]")
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(vec_col).alias("qv"))
    return _adc_rank(index, id_col, q, codebooks, coarse_centroids,
                     n_probes, k)


def pq_cell_index_hier(df: DataFrame, vec_col: str, id_col: str,
                       codebooks: list[list[list[float]]],
                       coarse: list[tuple[int, list[float]]],
                       subs: DataFrame,
                       route_probes: int = 1) -> DataFrame:
    """(id, codes, cell, route): the MILLION-CELL on-disk IVFADC index —
    PQ codes under two-level routing. `ivf.write_cell_index`'s own sizing
    law says the hier regime partitions the store by ROUTE (K1
    directories) with cells pruned by parquet min/max inside each route's
    files; this face produces exactly that shape: coarse route + sub-cell
    from the persisted (route, cb) codebook (`ivf.hier_codebook`), PQ
    codes from the same raw-vector pass. Two chained map-only Arrow
    kernels over ONE scan (Spark pipelines them in a single stage); no
    raw vectors in the output — the store stays M codes + two longs per
    row. ``route_probes`` > 1 stores each id under its p nearest routes
    (up to p rows per id; probe faces reduce per (query, neighbor)).

    Write with ``ivf.write_cell_index(idx, path, partition_col="route")``
    and probe with ``pq_topk_index_hier``."""
    from . import ivf as _ivf

    assigned = _ivf._np_assign_with_subs(df, vec_col, id_col, coarse, subs,
                                         route_probes=route_probes)
    if route_probes > 1:
        assigned = assigned.drop("_rk")
    enc = _np_encoded(assigned, "v", id_col, codebooks,
                      carry=("route", "cell"))
    return enc.select(id_col, "codes", "cell", "route")


def _collect_subs(subs: DataFrame) -> dict[int, list[tuple[int, list[float]]]]:
    """{route: [(cell, centroid)]} from a (route, cb) codebook frame —
    one codebook-sized collect (K1·k2·dim doubles), the same driver
    constant every hier face already holds."""
    return {int(r["route"]): [(int(e["cell"]), [float(x) for x in e["cv"]])
                              for e in r["cb"]]
            for r in subs.collect()}


def _probe_tables(coarse, subs_map):
    """Padded numpy lookup tables for vectorized two-level probe
    selection, shared by the collect face (`_hier_query_probes`) and the
    kernel probe face (`_np_probe_frame`): (cids, cmat) the coarse
    codebook in ascending-cell order, (scell, scent, svalid) the per-route
    sub-cell id/centroid/validity arrays padded to the widest route. None
    when no route has any sub-cell (no probes can exist)."""
    import numpy as np

    ordered = sorted(coarse)
    cids = np.array([c for c, _ in ordered], dtype=np.int64)
    cmat = np.asarray([v for _, v in ordered], dtype=np.float64)
    nr, dim = cmat.shape
    k2max = max((len(v) for v in subs_map.values()), default=0)
    if k2max == 0:
        return None
    pad = np.iinfo(np.int64).max
    scell = np.full((nr, k2max), pad, dtype=np.int64)
    scent = np.zeros((nr, k2max, dim))
    svalid = np.zeros((nr, k2max), dtype=bool)
    for ri, rid in enumerate(cids):
        for j, (cell, cv) in enumerate(subs_map.get(int(rid), [])):
            scell[ri, j], scent[ri, j], svalid[ri, j] = cell, cv, True
    return cids, cmat, scell, scent, svalid


def _select_probes(qmat, tables, n_probes: int, route_probes: int):
    """(ro, co, nv): per query row the globally nearest (route, cell)
    probes — ro/co are (m, w) int64 with w = min(n_probes, candidate
    width), nv the per-row count of VALID probes (first nv columns of
    each row). The vectorized two-level selection: rank coarse routes by
    squared L2 (stable argsort on ascending cids = (distance, route)
    tie-break), then the candidate sub-cells of the route_probes nearest
    routes by lexsort((cell, route, distance)) — byte-for-byte the
    chunked math the collect face has pinned against the brute-force
    replay since r12; chunked to bound the (m, p, k2max, dim) temp at
    ~tens of MB."""
    import numpy as np

    cids, cmat, scell, scent, svalid = tables
    # Candidate width is bounded by the ROUTES THAT EXIST, not the
    # requested route_probes: argsort below yields at most len(cids)
    # columns, so w computed from route_probes alone over-allocates ro/co
    # and the chunk assignment raises a broadcast ValueError when
    # route_probes > len(cids) and n_probes > nr*k2max (ADVICE r14 —
    # the pre-refactor loop clipped per row and returned partial probes).
    w = min(n_probes, min(route_probes, len(cids)) * scell.shape[1])
    m_all = len(qmat)
    ro = np.empty((m_all, w), dtype=np.int64)
    co = np.empty((m_all, w), dtype=np.int64)
    nv = np.empty(m_all, dtype=np.int64)
    chunk = 2048
    for lo in range(0, m_all, chunk):
        q = qmat[lo:lo + chunk]
        d = ((q[:, None, :] - cmat[None]) ** 2).sum(-1)       # (m, nr)
        # cids ascend, so a STABLE argsort on d = order by (d, cid) —
        # the loop form's lexsort((cids, d))
        rsel = np.argsort(d, axis=1, kind="stable")[:, :route_probes]
        dd = ((q[:, None, None, :] - scent[rsel]) ** 2).sum(-1)
        m = len(q)
        ddf = np.where(svalid[rsel], dd, np.inf).reshape(m, -1)
        cellf = scell[rsel].reshape(m, -1)
        routef = np.ascontiguousarray(np.broadcast_to(
            cids[rsel][..., None], scell[rsel].shape)).reshape(m, -1)
        order = np.lexsort((cellf, routef, ddf), axis=1)[:, :w]
        ddo = np.take_along_axis(ddf, order, 1)
        ro[lo:lo + m] = np.take_along_axis(routef, order, 1)
        co[lo:lo + m] = np.take_along_axis(cellf, order, 1)
        nv[lo:lo + m] = np.minimum(w, np.isfinite(ddo).sum(axis=1))
    return ro, co, nv


def _hier_query_probes(qrows, coarse, subs_map, n_probes: int,
                       route_probes: int):
    """[(query_id, route, cell)]: per query, rank the sub-cells of its
    ``route_probes`` nearest coarse routes by squared L2 to the
    sub-centroid and keep the ``n_probes`` globally nearest, tie-broken
    on (distance, route, cell). Driver-side numpy, VECTORIZED over the
    whole query batch (round-12: the per-query Python loop made the
    collect face choke at ~100k queries on loop overhead alone, long
    before driver memory mattered) — distances keep the loop form's
    elementwise (q−c)² pairwise summation, so tie-breaks are bitwise
    identical to the brute-force replay
    (tests/test_pq.py::test_hier_query_probes_matches_bruteforce).
    The result doubles as the STATIC pushdown lists for the store scan;
    for batches past driver scale, use the join face
    (``broadcast_queries=False``) instead. Distances here sum PAIRWISE
    (numpy) while the join face's expr probe kernel folds left-to-right —
    see the FP parity caveat on `_hier_probe_frame`."""
    import numpy as np

    if not qrows:
        return []
    tables = _probe_tables(coarse, subs_map)
    if tables is None:
        return []
    qids = [q for q, _ in qrows]
    qmat = np.asarray([v for _, v in qrows], dtype=np.float64)
    ro, co, nv = _select_probes(qmat, tables, n_probes, route_probes)
    out = []
    for i, qid in enumerate(qids):
        out.extend((qid, int(ro[i, j]), int(co[i, j]))
                   for j in range(int(nv[i])))
    return out


def _rank_tail(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, adc) -> per-query ascending top-k with the
    (adc, neighbor_id) tie-break shared by every ADC face."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "adc", "rank"))


def _hier_probe_frame(q: DataFrame, codebooks: list[list[list[float]]],
                      coarse: list[tuple[int, list[float]]],
                      subs: DataFrame, n_probes: int,
                      route_probes: int,
                      carry: tuple[str, ...] = ()) -> DataFrame:
    """(query_id[, carry...], luts, route, cell): the DISTRIBUTED twin of
    `_hier_query_probes` — the same two-level probe selection (per query,
    the n_probes globally nearest sub-cells of its route_probes nearest
    coarse routes, ties (distance, route, cell) ascending) computed as
    DataFrame operations so the query batch NEVER collects to the driver.
    Coarse routing is the literal-codebook expression (row-local); the
    (route, cb) sub-codebook arrives by route_probes broadcast equi-joins
    on route (K1 rows each — route i's join key is the i-th nearest
    route), so every query row carries its probed routes' candidate
    arrays SIDE-BY-SIDE and the global top-n_probes is a row-local
    flatten → array_sort → slice over ~route_probes·k2 candidate structs.
    ZERO exchanges on the query side (the round-12 shape paid one
    groupBy(query_id) shuffle of the same structs — r13 rewrite), and
    every stage is stream-legal (stream-static broadcast joins + row-local
    expressions), so this frame IS the streaming probe face too
    (`pq_collision_stream_hier(global_n_probes=...)` rides it; ``carry``
    threads the event-time column through). Each probe row carries the
    query's LUT (M·K doubles), trading n_probes× LUT duplication for not
    re-joining queries later — the LUT is codebook-sized, not
    corpus-sized.

    FP parity caveat (ADVICE r12): this face folds probe-selection
    distances left-to-right (F.aggregate — the same order as the DuckDB
    oracle's list_sum fold), while the collect face sums numpy pairwise;
    on a pair of candidate cells whose TRUE distances differ by less than
    the two summation orders' ulp drift, the faces could select different
    probe cells, so the pinned 'both faces return identical rows' contract
    is empirical on the gate data, not an FP guarantee. The repo's round6
    discipline is deliberately NOT applied here: rounding selection
    distances would have to reach ivf._dist_structs (shared by the cell
    assignment of every IVF operator and their oracles) and the o77
    DuckDB twin in the same change, and a boundary-straddling true tie
    would merely move the fragility to the rounding edge. Near-tie probe
    divergence is benign for RESULTS only when the k-th neighbor is not
    unique to the divergent cell — callers needing hard cross-face
    determinism should pass the same face on both sides."""
    routes = F.transform(
        F.slice(ivf._dist_structs("qv", coarse), 1, route_probes),
        lambda s: s["cell"])
    out = q.select("query_id", *carry, "qv", routes.alias("_routes"))

    def _cands(i: int) -> Column:
        # NOTE: close over the route/cb columns OUTSIDE the transform
        # lambda — a 2-arg lambda would make F.transform pass the array
        # INDEX as the second argument, shadowing any `i=i` default
        r_i, cb_i = F.col(f"_r{i}"), F.col(f"_cb{i}")
        return F.transform(cb_i, lambda c: F.struct(
            F.aggregate(F.zip_with(F.col("qv"), c["cv"],
                                   lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda a, b: a + b).alias("d"),
            r_i.alias("route"),
            c["cell"].alias("cell")))

    cand_arrays = []
    for i in range(route_probes):
        # route i's sub-codebook rides its own broadcast join keyed on the
        # i-th nearest route — left join: a route absent from `subs` (no
        # sub-cells) contributes no candidates, matching the inner-join
        # drop of the former groupBy shape
        subs_i = subs.select(F.col("route").alias(f"_r{i}"),
                             F.col("cb").alias(f"_cb{i}"))
        out = out.join(
            F.broadcast(subs_i),
            F.element_at(F.col("_routes"), i + 1) == F.col(f"_r{i}"),
            "left")
        cand_arrays.append(_cands(i))
    probes = F.slice(
        F.array_sort(F.flatten(F.filter(
            F.array(*cand_arrays), lambda a: a.isNotNull()))),
        1, n_probes)
    return (out.select("query_id", *carry, "qv",
                       F.explode(probes).alias("p"))
            .select("query_id", *carry,
                    _lut_expr("qv", codebooks).alias("luts"),
                    F.col("p.route").alias("route"),
                    F.col("p.cell").alias("cell")))


def _np_probe_frame(q: DataFrame, codebooks: list[list[list[float]]],
                    coarse: list[tuple[int, list[float]]],
                    subs: DataFrame, n_probes: int, route_probes: int,
                    carry: tuple[str, ...] = ()) -> DataFrame:
    """(query_id[, carry...], luts, route, cell): the Arrow-KERNEL twin of
    `_hier_probe_frame` — identical output contract, but the two-level
    probe selection runs as ONE map-side mapInPandas pass over the query
    batch instead of route_probes broadcast joins + interpreted HOF
    distance expressions. The expr face pays O(batch × route_probes × k2
    × dim) interpreted `F.aggregate`/`zip_with` lambdas, which at store
    scale (k2 ~ hundreds) dominates the whole probe (measured,
    SCALING.json `pq_store_scale_r14`); here the same candidate distances
    are one vectorized numpy broadcast per Arrow batch — byte-for-byte
    the `_select_probes` math the collect face is pinned on, so this face
    selects bitwise-identical probes to the collect face (the expr face's
    left-to-right fold is the one with the near-tie FP caveat). The
    (route, cb) sub-codebook is collected ONCE into the closure — a
    codebook-sized driver constant, the same K1·k2·dim doubles every hier
    face already holds — so the kernel is map-only: still zero query-side
    exchanges and still stream-legal (mapInPandas + row-local
    expressions). LUT entries stay the `_lut_expr` EXPRESSION per probe
    row — their values feed unrounded ADC comparisons downstream, and the
    expression fold is the bit-parity face against the DuckDB twin;
    only probe SELECTION (which cells get read) moves to numpy."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    tables = _probe_tables(coarse, _collect_subs(subs))
    out = StructType(
        [q.schema["query_id"]] + [q.schema[c] for c in carry]
        + [q.schema["qv"],
           StructField("route", LongType()),
           StructField("cell", LongType())])

    def sel(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf) or tables is None:
                continue
            # NULL query vectors produce no probe rows — the expr face's
            # explode(NULL probes) drop, the same contract
            nz = np.flatnonzero(~pdf["qv"].isna().to_numpy())
            if not len(nz):
                continue
            qmat = np.asarray([np.asarray(pdf["qv"].iloc[i],
                                          dtype=np.float64) for i in nz])
            ro, co, nv = _select_probes(qmat, tables, n_probes,
                                        route_probes)
            body = pdf.iloc[np.repeat(nz, nv)].reset_index(drop=True)
            mask = np.arange(ro.shape[1])[None, :] < nv[:, None]
            res = {c: body[c] for c in ["query_id", *carry, "qv"]}
            res["route"] = ro[mask]
            res["cell"] = co[mask]
            yield pd.DataFrame(res)

    probed = q.select("query_id", *carry, "qv").mapInPandas(sel, out)
    return probed.select("query_id", *carry,
                         _lut_expr("qv", codebooks).alias("luts"),
                         "route", "cell")


def pq_topk_index_hier(index: DataFrame, queries: DataFrame, vec_col: str,
                       id_col: str, k: int,
                       codebooks: list[list[list[float]]],
                       coarse: list[tuple[int, list[float]]],
                       subs: DataFrame, n_probes: int = 4,
                       route_probes: int = 2,
                       broadcast_queries: bool = True,
                       probe_kernel: str = "np") -> DataFrame:
    """ADC top-k against a ROUTE-PARTITIONED `pq_cell_index_hier` store.
    The probe set — each query's n_probes nearest (route, cell) pairs
    under route_probes coarse routes — is computed driver-side from the
    query batch and the persisted sub-codebook, then applied to the scan
    as STATIC predicates: `route IN (...)` prunes whole partition
    directories (K1-sized, the hier twin of the flat store's dynamic
    partition pruning) and `cell IN (...)` pushes into parquet row-group
    min/max inside the surviving routes — so a probe physically reads
    O(probed cells) regardless of store size OR cell count (a
    million-cell store no longer needs a million directories). Candidate
    scoring is the same broadcast-LUT ADC as `pq_topk_index`; a
    route_probes>1 STORE can surface the same (query, neighbor) once per
    shared probe, so candidates reduce per pair before ranking (min adc —
    the values are identical, codes don't vary by probe row).

    Sizing guidance (measured, SCALING.json pq_store_manifold_r13): on
    HIERARCHICAL geometry (clusters-of-clusters — real embedding
    corpora), route_probes=1 caps probe recall well below the ADC
    ceiling no matter how large n_probes is (0.765 plateau on the
    planted 8x8 fixture vs 0.925 at route_probes=2) — the lost
    neighbors live in un-probed ROUTES. Default route_probes=2; 1 is
    for genuinely flat geometry only. CI pin:
    tests/test_manifold_quality.py::test_pq_store_probe_needs_route_multiprobe.

    ``broadcast_queries=False`` switches to the DISTRIBUTED probe face:
    probe selection runs as DataFrame ops (`_hier_probe_frame`) and
    candidates arrive by a shuffle equi-join on (route, cell) — no
    driver-side query collect, the face for service-scale query batches;
    see the inline crossover note. Both faces return identical rows
    (pytest-pinned)."""
    if n_probes < 1:
        raise ValueError("n_probes must be >= 1")
    if not 1 <= route_probes <= len(coarse):
        raise ValueError(f"route_probes must be in [1, {len(coarse)}]")
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(vec_col).alias("qv"))
    adc = _adc_expr(codebooks)
    if not broadcast_queries:
        # DISTRIBUTED probe face (round-11 verdict ask #4): the query
        # batch never touches the driver — probe selection is the
        # DataFrame twin (_hier_probe_frame) and candidates arrive by a
        # shuffle equi-join on (route, cell). The price is pruning: with
        # no driver-known probe set there are no static route/cell
        # predicates, so the STORE scan is not directory-pruned — right
        # for service-scale query sets (millions of queries), where scan
        # cost amortizes over the batch and a driver collect would be
        # the actual bottleneck. Face choice after the r14 kernel
        # (SCALING.json `pq_probe_kernel_r14`): the collect face is the
        # one that PRUNES THE STORE (decisive when the store is huge and
        # the batch probes few cells); this face with probe_kernel="np"
        # is the throughput face — fastest at every measured batch size
        # on the 10x store (156.7 vs 212.6 s at 100k queries) with no
        # driver collect. Value parity is pinned in
        # tests/test_pq.py::test_join_probe_face_matches_collect_face.
        # probe_kernel picks HOW the probe set is computed: "np" (default
        # — the Arrow kernel, vectorized selection bitwise-matching the
        # collect face; at store-scale k2 the expr face's interpreted HOF
        # distances dominated the whole probe, SCALING.json
        # `pq_store_scale_r14`/`pq_probe_kernel_r14`) or "expr" (the
        # broadcast-join + HOF face, whose left-to-right fold is the
        # oracle-order selection — the face pq_collision_stream_hier's
        # gate query keeps).
        if probe_kernel == "np":
            probes = _np_probe_frame(q, codebooks, coarse, subs,
                                     n_probes, route_probes)
        elif probe_kernel == "expr":
            probes = _hier_probe_frame(q, codebooks, coarse, subs,
                                       n_probes, route_probes)
        else:
            raise ValueError(f"unknown probe kernel: {probe_kernel!r}")
        scored = (index.join(probes, ["route", "cell"])
                  .where(F.col(id_col) != F.col("query_id"))
                  .select("query_id", F.col(id_col).alias("neighbor_id"),
                          adc.alias("adc"))
                  .groupBy("query_id", "neighbor_id")
                  .agg(F.min("adc").alias("adc")))
        return _rank_tail(scored, k)
    qrows = [(r["query_id"], list(r["qv"])) for r in q.collect()]
    probes = _hier_query_probes(qrows, coarse, _collect_subs(subs),
                                n_probes, route_probes)
    spark = index.sparkSession
    qprobes = spark.createDataFrame(
        probes, schema="query_id long, route long, cell long")
    routes = sorted({r for _, r, _ in probes})
    cells = sorted({c for _, _, c in probes})
    pruned = index.where(F.col("route").isin(routes)
                         & F.col("cell").isin(cells))
    luts = q.select("query_id", _lut_expr("qv", codebooks).alias("luts"))
    scored = (pruned.join(F.broadcast(qprobes), ["route", "cell"])
              .where(F.col(id_col) != F.col("query_id"))
              .join(F.broadcast(luts), "query_id")
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      adc.alias("adc"))
              .groupBy("query_id", "neighbor_id")
              .agg(F.min("adc").alias("adc")))
    return _rank_tail(scored, k)


def pq_collision_stream_hier(stream: DataFrame, index: DataFrame,
                             vec_col: str, id_col: str,
                             codebooks: list[list[list[float]]],
                             coarse: list[tuple[int, list[float]]],
                             subs: DataFrame, tau_adc: float,
                             route_probes: int = 1,
                             cells_per_route: int = 1,
                             ts_col: str = "ts",
                             watermark: str = "10 minutes",
                             global_n_probes: int | None = None
                             ) -> DataFrame:
    """Streaming face of the ROUTE-PARTITIONED PQ code store
    (`pq_cell_index_hier`): (id, ts) of streamed embeddings whose
    asymmetric distance to some indexed row in their probed (route, cell)
    pairs is <= tau_adc — `pq_collision_stream`'s twin for the
    million-cell regime, completing batch/disk/stream symmetry.

    Probe shape, per-route default: the ``route_probes`` nearest coarse
    routes come from the literal-codebook expression, the (route, cb)
    sub-codebook arrives by a stream-static equi-join on route
    (broadcast, K1 rows), and the top ``cells_per_route`` cells within
    each probed route are an array_sort + slice over the joined cb
    column — route_probes x cells_per_route probes per row.

    ``global_n_probes`` switches probe selection to the BATCH probe's
    semantics — the n_probes GLOBALLY nearest sub-cells across the probed
    routes, ties (distance, route, cell) — by riding `_hier_probe_frame`,
    whose r13 row-local rewrite is stream-legal (route_probes
    stream-static broadcast joins + a row-local flatten/sort/slice; no
    aggregation). This is the streaming twin of the distributed probe
    face (r12 verdict ask #5): a service-scale streaming query load now
    probes exactly the cells `pq_topk_index_hier` would, instead of a
    fixed per-route quota. ``cells_per_route`` is ignored in this mode.

    Every stage in both modes is stream-legal; on a batch frame the SAME
    plan runs with groupBy-min in place of the watermark dedup (how
    tests pin stream == batch). Same ADC guard (`_adc_expr`) and
    repeated-id caveat as pq_collision_stream: the guarantee is over the
    flagged ID SET."""
    if not 1 <= route_probes <= len(coarse):
        raise ValueError(f"route_probes must be in [1, {len(coarse)}]")
    if global_n_probes is not None:
        if global_n_probes < 1:
            raise ValueError("global_n_probes must be >= 1")
        q = stream.select(F.col(id_col).alias("query_id"), F.col(ts_col),
                          _as_double(vec_col).alias("qv"))
        probed = (_hier_probe_frame(q, codebooks, coarse, subs,
                                    global_n_probes, route_probes,
                                    carry=(ts_col,))
                  .withColumnRenamed("query_id", id_col))
        idx = index.select(F.col(id_col).alias("_iid"), "codes", "route",
                           "cell")
        adc = _adc_expr(codebooks)
        hits = (probed.join(idx, ["route", "cell"])
                .where(F.col(id_col) != F.col("_iid"))
                .where(adc <= F.lit(float(tau_adc)))
                .select(id_col, ts_col))
        if hits.isStreaming:
            return (hits.withWatermark(ts_col, watermark)
                        .dropDuplicatesWithinWatermark([id_col]))
        return hits.groupBy(id_col).agg(F.min(ts_col).alias(ts_col))
    if cells_per_route < 1:
        raise ValueError("cells_per_route must be >= 1")
    routed = (stream.select(F.col(id_col), F.col(ts_col),
                            _as_double(vec_col).alias("qv"))
              .withColumn("luts", _lut_expr("qv", codebooks))
              .select(id_col, ts_col, "luts", "qv",
                      F.explode(F.slice(
                          F.transform(ivf._dist_structs("qv", coarse),
                                      lambda s: s["cell"]),
                          1, route_probes)).alias("route")))
    best = F.slice(F.array_sort(F.transform(
        F.col("cb"),
        lambda c: F.struct(
            F.aggregate(F.zip_with(F.col("qv"), c["cv"],
                                   lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda a, b: a + b).alias("d"),
            c["cell"].alias("cell")))), 1, cells_per_route)
    probed = (routed.join(F.broadcast(subs), "route")
              .select(id_col, ts_col, "luts", "route",
                      F.explode(best).alias("_pc"))
              .select(id_col, ts_col, "luts", "route",
                      F.col("_pc.cell").alias("cell")))
    idx = index.select(F.col(id_col).alias("_iid"), "codes", "route",
                       "cell")
    adc = _adc_expr(codebooks)
    hits = (probed.join(idx, ["route", "cell"])
            .where(F.col(id_col) != F.col("_iid"))
            .where(adc <= F.lit(float(tau_adc)))
            .select(id_col, ts_col))
    if hits.isStreaming:
        return (hits.withWatermark(ts_col, watermark)
                    .dropDuplicatesWithinWatermark([id_col]))
    return hits.groupBy(id_col).agg(F.min(ts_col).alias(ts_col))


def pq_rerank(shortlist: DataFrame, df: DataFrame, vec_col: str,
              id_col: str, k: int) -> DataFrame:
    """Exact-cosine re-rank of an ADC shortlist (Jégou TPAMI'11 §V-A's
    IVFADC-R refinement): join the shortlist's (query_id, neighbor_id)
    pairs back to the raw vectors and keep the exact top-k. The raw-vector
    scan is candidate-sized — shortlist rows × 2 lookups — which is the
    whole point of the code-sized index: the 100 TB corpus is read as
    codes, raw floats only for the few survivors. Output matches
    similarity.cosine_topk's shape (query_id, neighbor_id, cosine, rank)."""
    from .dedup import _dot, _norm

    base = df.select(F.col(id_col), _as_double(vec_col).alias("v"))
    cand = shortlist.select("query_id", "neighbor_id")
    # broadcast the candidate-sized side both times: the raw-vector table
    # is scanned map-side twice (semi-join-shaped lookups), never shuffled
    scored = (base.select(F.col(id_col).alias("query_id"),
                          F.col("v").alias("qv"))
              .join(F.broadcast(cand), "query_id")
              .join(F.broadcast(base.select(
                  F.col(id_col).alias("neighbor_id"),
                  F.col("v").alias("nv"))
                  .join(F.broadcast(cand.select("neighbor_id").distinct()),
                        "neighbor_id")), "neighbor_id")
              .select("query_id", "neighbor_id",
                      (_dot(F.col("qv"), F.col("nv"))
                       / (_norm(F.col("qv")) * _norm(F.col("nv"))))
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def pq_collision_stream(stream: DataFrame, index: DataFrame, vec_col: str,
                        id_col: str,
                        codebooks: list[list[list[float]]],
                        coarse_centroids: list[tuple[int, list[float]]],
                        tau_adc: float, n_probes: int = 1,
                        ts_col: str = "ts",
                        watermark: str = "10 minutes") -> DataFrame:
    """Streaming face of the PQ code store: (id, ts) of streamed embeddings
    whose asymmetric distance to some indexed row in their probed cells is
    <= tau_adc — the PQ twin of `ivf.semdedup_collision_stream`, with the
    static side reading the CODE store (M bytes per indexed row) instead
    of raw vectors. The streamed vector stays exact (it is the ADC query):
    its LUT and coarse probe are row-local literal-codebook expressions,
    the probe is a stream-static equi-join on cell, the ADC gate a
    row-local expression, and the one-flag-per-id rule a watermarked
    dedup. On a batch frame the SAME plan runs with a groupBy-min in
    place of the watermark dedup (how tests pin stream == batch).

    `tau_adc` is a squared-L2 distance (smaller = nearer), matching
    pq_topk's `adc` column. Same repeated-id caveat as
    semdedup_collision_stream: the guarantee is over the flagged ID SET;
    the streaming face keeps the first-arriving ts, the batch face
    min(ts)."""
    if not 1 <= n_probes <= len(coarse_centroids):
        raise ValueError(f"n_probes must be in [1, {len(coarse_centroids)}]")
    probed = (stream.select(F.col(id_col), F.col(ts_col),
                            _as_double(vec_col).alias("qv"))
              .withColumn("luts", _lut_expr("qv", codebooks))
              .select(id_col, ts_col, "luts",
                      F.explode(F.slice(
                          ivf._dist_structs("qv", coarse_centroids),
                          1, n_probes)).alias("p"))
              .select(id_col, ts_col, "luts",
                      F.col("p.cell").alias("cell")))
    idx = index.select(F.col(id_col).alias("_iid"), "codes", "cell")
    adc = _adc_expr(codebooks)
    hits = (probed.join(idx, "cell")
            .where(F.col(id_col) != F.col("_iid"))
            .where(adc <= F.lit(float(tau_adc)))
            .select(id_col, ts_col))
    if hits.isStreaming:
        return (hits.withWatermark(ts_col, watermark)
                    .dropDuplicatesWithinWatermark([id_col]))
    return hits.groupBy(id_col).agg(F.min(ts_col).alias(ts_col))
