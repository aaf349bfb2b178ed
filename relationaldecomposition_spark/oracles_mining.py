"""Exhaustive DuckDB oracles for the mining queries (b03, b11, b15).

Strategy shared by all three: DuckDB computes the full subset-entropy table
of the small mining relation in ONE pass — ``GROUP BY CUBE`` over all n
columns yields every 2^n histogram, keyed by ``grouping_id`` (verified to
use the same MSB-first bit convention as our Python ``gid`` helper) — and
the measure combinatorics are generated in Python as literal VALUES lists
joined against that entropy table. This keeps the oracle a single static
ANSI-SQL string while still enumerating every candidate the miner could
possibly emit, independent of the miner's own search order.

Semantics mirrored (thresholds from core/deps.py):
- b03: a candidate is "accurate" iff its clamped measure <= alpha = 0, i.e.
  raw measure <= MEASURE_CLAMP (1e-7). Candidates are every canonical
  (lhs, rhs-partition-block) MVD plus the saturated FDs — at alpha = 0 the
  bottom-up miner is exhaustive over these (exact MVDs propagate to larger
  determinants by the chain rule, so level-wise discovery loses nothing);
  the pytest suite pins mine() == brute_force() on fixtures.
  Reference oracle pattern: `Main.singleDatasetTest` (Main.java:238-272).
- b11: S is an (x,y)-separator iff SOME 2-partition {A,B} of R-S with x∈A,
  y∈B has JD measure <= ACCURACY (1e-5): any accepted k-component JD
  coarsens to such a 2-partition without increasing the measure
  (submodularity), and a 2-partition is itself a separating JD. Minimality
  = no proper subset separates (separation is monotone in S). Mirrors
  `testMinSeps2` (search/MinimalJDGenerator.java:1295-1361).
- b15: the enumerated schemas' cluster sets are fixed search output (driver
  data is deterministic per scale factor); the oracle recomputes each
  schema's spurious-tuple count from the data via the same natural-join
  counting SQL used by the a13/a15 oracles.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterable, Sequence

MEASURE_CLAMP = 1e-7   # entropy/AbstractDataset.java:20 THRESHOLD
MEASURE_ACCURACY = 1e-5  # search/MinimalJDGenerator.java:213 ACCURACY


def _gid(subset: Iterable[str], all_cols: Sequence[str]) -> int:
    """grouping_id of a CUBE row keeping exactly `subset`: bit i (MSB-first
    over all_cols) is 1 when that column is aggregated away."""
    s = set(subset)
    g = 0
    for c in all_cols:
        g = (g << 1) | (0 if c in s else 1)
    return g


def _fmt_set(cols: Iterable[str]) -> str:
    return "{" + ",".join(sorted(cols)) + "}"


def _sql_ent_ctes(rel: str, cols: Sequence[str]) -> str:
    """CTE fragment `cnts, tot, ent`: ent(gid, h) holds H(X) for every
    subset X of `cols` of relation `rel`, H = log2(N) - sum(c*log2(c))/N —
    the exact formula the Spark engine uses."""
    collist = ", ".join(cols)
    return (
        f"cnts AS (SELECT grouping_id({collist}) AS gid, count(*) AS c "
        f"FROM {rel} GROUP BY CUBE ({collist})), "
        f"tot AS (SELECT count(*) AS n FROM {rel}), "
        f"ent AS (SELECT gid, log2(tot.n) - coalesce(sum(c * log2(c)), 0) / tot.n AS h "
        f"FROM cnts, tot GROUP BY gid, tot.n)"
    )


def rhs_partition_blocks(lhs: frozenset[str], schema: Sequence[str]):
    """Canonical two-block partitions of schema - lhs: the block NOT
    containing the last non-lhs attribute (mining/lattice.rhs_partitions)."""
    non_lhs = [c for c in schema if c not in lhs]
    m = len(non_lhs)
    for mask in range(1, 1 << (m - 1)):
        yield frozenset(non_lhs[j] for j in range(m - 1) if (mask >> j) & 1)


# ---------------------------------------------------------------------------
# b03: exhaustive MVD/FD enumeration on the 5-column projection
# ---------------------------------------------------------------------------

def oracle_b03(denorm_sql: str, cols: Sequence[str]) -> str:
    """All canonical MVDs (every lhs, every RHS-partition block) plus
    saturated FDs of the projection, kept iff raw measure <= 1e-7."""
    full = frozenset(cols)
    mvd_rows: list[str] = []
    for r in range(0, len(cols) - 1):
        for det in itertools.combinations(cols, r):
            lhs = frozenset(det)
            for rhs in rhs_partition_blocks(lhs, cols):
                xy = lhs | rhs
                mvd_rows.append(
                    f"('{_fmt_set(lhs)}', '{_fmt_set(rhs)}', "
                    f"{_gid(xy, cols)}, {_gid(full - rhs, cols)}, "
                    f"{_gid(lhs, cols)})")
    fd_rows = [
        f"('{_fmt_set(full - {a})}', '{_fmt_set({a})}', {_gid(full - {a}, cols)})"
        for a in cols
    ]
    proj = ", ".join(cols)
    return f"""
      WITH denorm AS ({denorm_sql}),
      d5 AS (SELECT {proj} FROM denorm),
      {_sql_ent_ctes('d5', cols)},
      hr AS (SELECT h FROM ent WHERE gid = 0),
      mvdc(lhs, rhs, g_xy, g_rmy, g_x) AS (VALUES {', '.join(mvd_rows)}),
      fdc(lhs, rhs, g_x) AS (VALUES {', '.join(fd_rows)})
      SELECT 'mvd' AS kind, lhs, rhs
      FROM mvdc JOIN ent exy ON exy.gid = g_xy
                JOIN ent ermy ON ermy.gid = g_rmy
                JOIN ent ex ON ex.gid = g_x, hr
      WHERE exy.h + ermy.h - ex.h - hr.h <= {MEASURE_CLAMP}
      UNION ALL
      SELECT 'fd' AS kind, lhs, rhs
      FROM fdc JOIN ent ex ON ex.gid = g_x, hr
      WHERE hr.h - ex.h <= {MEASURE_CLAMP}"""


# ---------------------------------------------------------------------------
# b11: all minimal pairwise separators
# ---------------------------------------------------------------------------

def _smask(subset: Iterable[str], cols: Sequence[str]) -> int:
    pos = {c: i for i, c in enumerate(cols)}
    return sum(1 << pos[c] for c in subset)


def _sql_minsep_ctes(cols: Sequence[str]) -> str:
    """CTE fragment ``cand, mu, sep, minimal``: derives, per attribute pair
    (x,y), every subset-minimal separator S (as bitmask ``smask`` over
    `cols`) from the shared ``ent``/``hr`` CTEs. S separates x,y iff SOME
    2-partition {A,B} of R-S with x∈A, y∈B has JD measure <= ACCURACY
    (see module docstring for why 2-partitions suffice)."""
    n = len(cols)
    cand_rows: list[str] = []
    for xi in range(n):
        for yi in range(xi + 1, n):
            x, y = cols[xi], cols[yi]
            pair_id = xi * n + yi
            others = [c for c in cols if c not in (x, y)]
            for sr in range(0, len(others) + 1):
                for s_tuple in itertools.combinations(others, sr):
                    s = frozenset(s_tuple)
                    rest = [c for c in others if c not in s]
                    # A gets x plus any subset of rest; B gets y + remainder
                    for ar in range(0, len(rest) + 1):
                        for a_extra in itertools.combinations(rest, ar):
                            a = frozenset(a_extra) | {x}
                            b = (frozenset(rest) - frozenset(a_extra)) | {y}
                            cand_rows.append(
                                f"({pair_id}, {_smask(s, cols)}, {_gid(s, cols)}, "
                                f"{_gid(s | a, cols)}, {_gid(s | b, cols)})")
    return f"""
      cand(pair_id, smask, g_s, g_sa, g_sb) AS (VALUES {', '.join(cand_rows)}),
      mu AS (
        SELECT pair_id, smask,
               min(ea.h + eb.h - es.h - hr.h) AS best
        FROM cand JOIN ent es ON es.gid = g_s
                  JOIN ent ea ON ea.gid = g_sa
                  JOIN ent eb ON eb.gid = g_sb, hr
        GROUP BY pair_id, smask),
      sep AS (SELECT pair_id, smask FROM mu WHERE best <= {MEASURE_ACCURACY}),
      minimal AS (
        SELECT s.pair_id, s.smask FROM sep s
        WHERE NOT EXISTS (
          SELECT 1 FROM sep s2
          WHERE s2.pair_id = s.pair_id AND s2.smask != s.smask
            AND (s2.smask & s.smask) = s2.smask))"""


def oracle_b11(denorm_sql: str, cols: Sequence[str]) -> str:
    """Enumerate, per attribute pair (x,y), every S ⊆ R-{x,y} and every
    2-partition of R-S separating x from y; S separates iff the best
    partition's JD measure <= 1e-5; keep subset-minimal S per pair; emit
    the distinct union."""
    n = len(cols)
    pos = {c: i for i, c in enumerate(cols)}
    name_rows = []
    for mask in range(1 << n):
        members = [c for c in cols if mask & (1 << pos[c])]
        name_rows.append(
            f"({mask}, '{','.join(sorted(members))}', {len(members)})")
    proj = ", ".join(cols)
    return f"""
      WITH denorm AS ({denorm_sql}),
      d6 AS (SELECT {proj} FROM denorm),
      {_sql_ent_ctes('d6', cols)},
      hr AS (SELECT h FROM ent WHERE gid = 0),
      {_sql_minsep_ctes(cols)},
      names(mask, sep_str, sz) AS (VALUES {', '.join(name_rows)})
      SELECT DISTINCT n.sep_str AS separator, n.sz::BIGINT AS size
      FROM minimal m JOIN names n ON n.mask = m.smask"""


# ---------------------------------------------------------------------------
# b15: data-certified validation of the enumerated schemas
# ---------------------------------------------------------------------------

def _junction_tree_edges(clusters: Sequence[frozenset[str]]) -> list[tuple[int, int]]:
    """Maximum-weight spanning tree (Kruskal over |Ci ∩ Cj|) of the cluster
    hypergraph — for an acyclic cluster set this is a junction tree, and the
    junction-tree theorem makes its edge-separator multiset invariant across
    all max spanning trees, so the derived separators equal the schema's JD
    lhs regardless of which tree Kruskal picks. Raises ValueError when the
    clusters are disconnected or violate the running-intersection property
    (i.e. the pinned constant is not an acyclic schema at all)."""
    k = len(clusters)
    if k <= 1:
        return []
    edges = sorted(
        ((len(clusters[i] & clusters[j]), i, j)
         for i in range(k) for j in range(i + 1, k)),
        key=lambda t: -t[0])
    parent = list(range(k))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    tree: list[tuple[int, int]] = []
    for w, i, j in edges:
        ri, rj = find(i), find(j)
        if ri != rj:
            if w == 0:
                raise ValueError(f"disconnected cluster set: {clusters}")
            parent[ri] = rj
            tree.append((i, j))
    if len(tree) != k - 1:
        raise ValueError(f"disconnected cluster set: {clusters}")
    # running-intersection: Ci ∩ Cj must lie in every cluster on the i→j path
    adj: dict[int, list[int]] = {i: [] for i in range(k)}
    for i, j in tree:
        adj[i].append(j)
        adj[j].append(i)

    def path(a, b):
        stack, prev = [a], {a: None}
        while stack:
            u = stack.pop()
            if u == b:
                out = []
                while u is not None:
                    out.append(u)
                    u = prev[u]
                return out
            for v in adj[u]:
                if v not in prev:
                    prev[v] = u
                    stack.append(v)
        raise AssertionError("tree not connected")

    for i in range(k):
        for j in range(i + 1, k):
            shared = clusters[i] & clusters[j]
            if any(not (shared <= clusters[u]) for u in path(i, j)):
                raise ValueError(
                    f"running-intersection violated between {sorted(clusters[i])} "
                    f"and {sorted(clusters[j])}: not an acyclic schema")
    return tree


def _edge_jds(clusters: Sequence[frozenset[str]]):
    """Per junction-tree edge, the induced 2-partition JD: (separator,
    union-of-side-A, union-of-side-B), sides including the separator."""
    tree = _junction_tree_edges(clusters)
    adj: dict[int, list[tuple[int, int]]] = {i: [] for i in range(len(clusters))}
    for ei, (i, j) in enumerate(tree):
        adj[i].append((j, ei))
        adj[j].append((i, ei))
    out = []
    for ei, (i, j) in enumerate(tree):
        # clusters reachable from i without crossing edge ei
        side_a: set[int] = set()
        stack = [i]
        while stack:
            u = stack.pop()
            if u in side_a:
                continue
            side_a.add(u)
            stack.extend(v for v, e in adj[u] if e != ei)
        ua = frozenset().union(*(clusters[u] for u in side_a))
        ub = frozenset().union(*(clusters[u] for u in range(len(clusters))
                                 if u not in side_a))
        out.append((clusters[i] & clusters[j], ua, ub))
    return out


def oracle_b15(denorm_sql: str, cols: Sequence[str],
               schemas: Sequence[Sequence[Sequence[str]]]) -> str:
    """For each enumerated schema, recompute n_clusters and the
    spurious-tuple count from the data (|⋈ distinct projections| − |distinct
    base|, the a13/a15 counting SQL) — AND certify the pinned cluster sets
    against the data rather than trusting them:

    - build-time (data-independent): each cluster set must form a connected
      junction tree satisfying the running-intersection property — i.e. BE
      an acyclic schema; jointly forming one tree is stronger than pairwise
      JD compatibility (B14). Malformed pins raise at import.
    - in-SQL (data-dependent): every junction-tree edge JD
      ⋈[S | A∖S, B∖S] must have measure H(A)+H(B)−H(S)−H(R) <= ACCURACY,
      and every edge separator S must be one of the minimal pairwise
      separators DERIVED from the data by the b11 CTEs. A schema failing
      either check emits NO row, so a stale pin (wrong scale factor,
      changed enumeration) surfaces as a loud rows-mismatch instead of a
      silent pass.

    The only part still pinned is the BFS *order* of the enumeration (which
    three maximal independent sets come first) — pure search-order, no data.
    Mirrors `search/AcyclicSchemaEnumerator.java:125-133,243-300`."""
    proj = ", ".join(cols)
    ctes = [
        f"denorm AS ({denorm_sql})",
        f"d6 AS (SELECT {proj} FROM denorm)",
        _sql_ent_ctes("d6", cols),
        "hr AS (SELECT h FROM ent WHERE gid = 0)",
        _sql_minsep_ctes(cols),
        "minmask AS (SELECT DISTINCT smask FROM minimal)",
        "dbase AS (SELECT count(*) AS n FROM (SELECT DISTINCT * FROM d6))",
    ]
    selects = []
    for si, clusters in enumerate(schemas):
        cl = [tuple(sorted(c)) for c in clusters]
        key = ";".join(sorted(",".join(c) for c in cl))
        for i, c in enumerate(cl):
            ctes.append(f"p{si}_{i} AS (SELECT DISTINCT {', '.join(c)} FROM d6)")
        join_sql = f"p{si}_0"
        seen = set(cl[0])
        for i, c in enumerate(cl[1:], start=1):
            shared = sorted(seen & set(c))
            if shared:
                join_sql += f" JOIN p{si}_{i} USING ({', '.join(shared)})"
            else:
                join_sql += f" CROSS JOIN p{si}_{i}"
            seen |= set(c)
        edge_rows = [
            f"({_gid(s, cols)}, {_gid(ua, cols)}, {_gid(ub, cols)}, {_smask(s, cols)})"
            for s, ua, ub in _edge_jds([frozenset(c) for c in cl])
        ]
        if edge_rows:
            ctes.append(
                f"edges{si}(g_s, g_ua, g_ub, sm) AS (VALUES {', '.join(edge_rows)})")
            ctes.append(
                f"ok{si} AS (SELECT coalesce(bool_and("
                f"ea.h + eb.h - es.h - hr.h <= {MEASURE_ACCURACY} "
                f"AND sm IN (SELECT smask FROM minmask)), TRUE) AS ok "
                f"FROM edges{si} JOIN ent es ON es.gid = g_s "
                f"JOIN ent ea ON ea.gid = g_ua "
                f"JOIN ent eb ON eb.gid = g_ub, hr)")
        else:
            # single-cluster schema: no join-tree edges, nothing to certify —
            # 'VALUES ' over zero rows would be malformed SQL
            ctes.append(f"ok{si} AS (SELECT TRUE AS ok)")
        selects.append(
            f"SELECT '{key}' AS clusters, {len(cl)}::BIGINT AS n_clusters, "
            f"((SELECT count(*) FROM {join_sql}) - (SELECT n FROM dbase))::BIGINT "
            f"AS spurious FROM ok{si} WHERE ok")
    return "WITH " + ",\n      ".join(ctes) + "\n" + " UNION ALL ".join(selects)


# ---------------------------------------------------------------------------
# o69: the decompose-e2e deliverable summary (schema choice + rejoin)
# ---------------------------------------------------------------------------

def _schema_join_ctes(si: int, clusters: Sequence[Sequence[str]],
                      cols: Sequence[str]) -> tuple[list[str], str]:
    """Per-schema CTEs: distinct projections p{si}_{i} and the natural-join
    chain over them (the Yannakakis-style rejoin the a13/a15 oracles use).
    Returns (ctes, join_sql)."""
    ctes = []
    cl = [tuple(sorted(c)) for c in clusters]
    for i, c in enumerate(cl):
        ctes.append(f"p{si}_{i} AS (SELECT DISTINCT {', '.join(c)} FROM d6)")
    join_sql = f"p{si}_0"
    seen = set(cl[0])
    for i, c in enumerate(cl[1:], start=1):
        shared = sorted(seen & set(c))
        if shared:
            join_sql += f" JOIN p{si}_{i} USING ({', '.join(shared)})"
        else:
            join_sql += f" CROSS JOIN p{si}_{i}"
        seen |= set(c)
    return ctes, join_sql


def oracle_decompose_summary(denorm_sql: str, cols: Sequence[str],
                             schemas: Sequence[Sequence[Sequence[str]]]) -> str:
    """DuckDB twin of the decompose-e2e deliverable (bench.py
    decompose_e2e, gated at the 6-col projection): per enumerated schema
    its data-recomputed spurious-tuple count, WHICH schema the
    (spurious ASC, n_clusters DESC, enumeration order) rule picks, and —
    for the picked schema only — the lossless-rejoin residuals
    |rejoin − base| / |base − rejoin| derived from the data with set
    EXCEPTs (the Spark face derives them from the actually WRITTEN
    bucketed tables, so the write path is inside the gate). Schemas are
    certified against the data exactly as in oracle_b15 (junction-tree
    edge measures + separators ∈ the b11-derived minimal-separator set);
    only the enumeration ORDER is pinned."""
    proj = ", ".join(cols)
    ctes = [
        f"denorm AS ({denorm_sql})",
        f"d6 AS (SELECT {proj} FROM denorm)",
        _sql_ent_ctes("d6", cols),
        "hr AS (SELECT h FROM ent WHERE gid = 0)",
        _sql_minsep_ctes(cols),
        "minmask AS (SELECT DISTINCT smask FROM minimal)",
        "dbase AS (SELECT count(*) AS n FROM (SELECT DISTINCT * FROM d6))",
    ]
    cand_selects = []
    for si, clusters in enumerate(schemas):
        cl = [tuple(sorted(c)) for c in clusters]
        key = ";".join(sorted(",".join(c) for c in cl))
        jc, join_sql = _schema_join_ctes(si, cl, cols)
        ctes.extend(jc)
        ctes.append(
            f"ex{si} AS (SELECT count(*) AS c FROM "
            f"(SELECT {proj} FROM {join_sql} EXCEPT SELECT {proj} FROM d6))")
        ctes.append(
            f"ms{si} AS (SELECT count(*) AS c FROM "
            f"(SELECT {proj} FROM d6 EXCEPT SELECT {proj} FROM {join_sql}))")
        edge_rows = [
            f"({_gid(s, cols)}, {_gid(ua, cols)}, {_gid(ub, cols)}, {_smask(s, cols)})"
            for s, ua, ub in _edge_jds([frozenset(c) for c in cl])
        ]
        if edge_rows:
            ctes.append(
                f"edges{si}(g_s, g_ua, g_ub, sm) AS (VALUES {', '.join(edge_rows)})")
            ctes.append(
                f"ok{si} AS (SELECT coalesce(bool_and("
                f"ea.h + eb.h - es.h - hr.h <= {MEASURE_ACCURACY} "
                f"AND sm IN (SELECT smask FROM minmask)), TRUE) AS ok "
                f"FROM edges{si} JOIN ent es ON es.gid = g_s "
                f"JOIN ent ea ON ea.gid = g_ua "
                f"JOIN ent eb ON eb.gid = g_ub, hr)")
        else:
            ctes.append(f"ok{si} AS (SELECT TRUE AS ok)")
        cand_selects.append(
            f"SELECT {si}::BIGINT AS enum_idx, '{key}' AS clusters, "
            f"{len(cl)}::BIGINT AS n_clusters, "
            f"((SELECT count(*) FROM {join_sql}) - (SELECT n FROM dbase))::BIGINT"
            f" AS spurious, (SELECT c FROM ex{si})::BIGINT AS rx, "
            f"(SELECT c FROM ms{si})::BIGINT AS rm FROM ok{si} WHERE ok")
    ctes.append("scand AS (" + " UNION ALL ".join(cand_selects) + ")")
    ctes.append("best AS (SELECT enum_idx FROM scand "
                "ORDER BY spurious ASC, n_clusters DESC, enum_idx ASC "
                "LIMIT 1)")
    return ("WITH " + ",\n      ".join(ctes) + "\n"
            "SELECT enum_idx, clusters, n_clusters, spurious,\n"
            "  (CASE WHEN enum_idx = (SELECT enum_idx FROM best)"
            " THEN 1 ELSE 0 END)::INT AS is_best,\n"
            "  (CASE WHEN enum_idx = (SELECT enum_idx FROM best)"
            " THEN rx END)::BIGINT AS rejoin_extra,\n"
            "  (CASE WHEN enum_idx = (SELECT enum_idx FROM best)"
            " THEN rm END)::BIGINT AS rejoin_missing\n"
            "FROM scand")
