"""SparkEntropyEngine: Shannon entropies of column subsets of a DataFrame.

Replaces the reference's three entropy backends — full-scan counting
(`entropy/ExternalFileDataSet.java:44-166`), H2 inverted-index SQL
(`entropy/CompressedDB.java`), and column-range-partitioned k-way joins
(`entropy/MasterCompressedDB.java`) — with one Spark-native design:

  H(X) = log2(N) - (1/N) * sum over groups g of X of (c_g * log2(c_g))

computed as ``df.groupBy(*X).count()`` + a scalar aggregate: one shuffle of
exactly the columns in X (Catalyst prunes the parquet scan to X), partial
map-side aggregation, and a one-row collect. The reference's dictionary
encoding (A3), inverted indexes (A4), tid joins (A6), and HAVING-singleton
correction (`entropy/CompressedDB.java:275-284,330-340`) all exist to make a
single-node SQL engine do this cheaply; on Spark they are subsumed by the
shuffle-based hash aggregate and Parquet's native dictionary encoding, so
none of them are materialized here.

Batching (A8, `ExternalFileDataSet.computeEntropies:111-166` — one scan
feeding many count maps) maps to SQL ``GROUP BY GROUPING SETS``: one scan +
one shuffle computes every subset's histogram, with ``grouping_id()``
separating subsets. Each grouping set replicates every input row once into
the shuffle, so batch width is capped (default 16 sets/job — the analogue of
MasterCompressedDB's RangeSize bound) and large requests are chunked.

Scale notes (100 TB):
- Entropy is algebraic: sum(c*log2(c)) over a group-by — partial aggregation
  means shuffled bytes are O(#distinct groups), not O(rows).
- High-cardinality subsets (worst case: near-key column sets) shuffle one
  row per group; AQE coalescing keeps partition counts sane. No driver-side
  data beyond the final scalar ever materializes.
- The driver-side cache (A9) is the real optimizer: lattice searches re-ask
  the same subsets constantly; the reference relies on the same memoization
  (`entropy/ExternalFileDataSet.java:15,44-48`).
"""

from __future__ import annotations

import math
import threading
import time
import uuid
from collections.abc import Callable, Iterable, Sequence
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, functions as F

from ..core.attrset import attrset, sorted_cols


class MiningCancelled(RuntimeError):
    """Raised between entropy chunk jobs when the engine's stop_check flips
    (B18 cooperative cancellation — see SparkEntropyEngine.stop_check)."""

# Cap on grouping sets per job: each set replicates the scan's rows into
# partial aggregation, so width w multiplies ONE job's expand input by w —
# but the TOTAL expand work over a request is width-invariant (sum over sets
# of N rows, however they are chunked), so the cap trades per-job size
# against the NUMBER of chunk jobs, each of which re-scans the input. The
# r14 per-chunk profile at sf10 (SCALING.json entropy_chunk_profile_r14,
# tools/profile_entropy_chunks.py) measured batch32 wall 17.8 s -> ~16 s
# (jobs 5 -> 4) raising 16 -> 32, and neutral at sf0.1 (same 4-job
# packing either way); at 100 TB fewer chunks = fewer corpus scans, which
# dominates once the input outgrows cache. Shuffle OUTPUT stays guarded by
# the group-mass budget (group_budget_rows), not by this cap; the original
# 16 matched the reference's RangeSize envelope (5-16,
# `search/MinimalJDGenerator.java:1142-1162`). Residual caveat: a COLD
# chunk (no cached estimates) is budget-blind, so a wider cap doubles the
# worst-case per-job partial-agg working set — in practice the
# singles-first seeding chunk populates estimates before any wide chunk
# runs.
DEFAULT_MAX_GROUPING_SETS = 32


def _powerset(cols: Sequence[str]):
    import itertools
    for r in range(len(cols) + 1):
        yield from itertools.combinations(cols, r)


def entropy_from_counts(counts: Iterable[int], num_rows: int) -> float:
    """Driver-side oracle: H from a histogram (AbstractDataset.java:187-201)."""
    if num_rows <= 0:
        return 0.0
    s = sum(c * math.log2(c) for c in counts if c > 1)
    return math.log2(num_rows) - s / num_rows


class SparkEntropyEngine:
    """Entropy measure engine over a single DataFrame (IDataset analogue,
    `entropy/IDataset.java:9-20`).

    Duplicate-row semantics follow the reference's entropy path: duplicates
    count as probability mass (§1.1 of SURVEY.md). ``num_distinct`` exposes
    the deduplicated count used by the decomposition-validation path.
    """

    def __init__(self, df: DataFrame, max_grouping_sets: int = DEFAULT_MAX_GROUPING_SETS,
                 cache_input: bool = True,
                 columns: Sequence[str] | None = None,
                 group_budget_rows: float = 4.0):
        """``columns``: when the mining column set is known up front, pass it
        here — the engine projects the input to exactly those columns BEFORE
        persisting, so the cache never holds full-width rows of a wide
        relation (every subsequent groupBy then scans only mined columns).
        Omitted = all columns of ``df`` are assumed minable."""
        if columns is not None:
            df = df.select(*columns)
        self.df = df
        self.schema_cols: tuple[str, ...] = tuple(df.columns)
        self.max_grouping_sets = max_grouping_sets
        # chunk shuffle-output budget, as a multiple of num_rows: a batch of
        # grouping sets whose cache-estimated group counts sum past this is
        # split, so near-key subsets don't amplify one job's shuffle 16x
        self.group_budget_rows = group_budget_rows
        self._cache: dict[frozenset[str], float] = {}
        self._lock = threading.Lock()
        # cooperative cancellation (B18): when set, polled between chunk
        # jobs — a timed-out miner stops launching NEW Spark jobs with at
        # most one chunk of latency (cancelJobGroup only kills in-flight
        # ones). Raising (not returning partial results) keeps measure
        # semantics intact; the runner's worker thread dies on it.
        self.stop_check: Callable[[], bool] | None = None
        # in-flight dedup: subset -> Event set when its batch lands in the
        # cache; concurrent miner threads wait instead of recomputing
        self._inflight: dict[frozenset[str], threading.Event] = {}
        # column sets whose full subset lattice is already cached (A11 CUBE)
        self._cubes_done: set[frozenset[str]] = set()
        # in-flight CUBE jobs: key -> Event, so two threads asking for the
        # same lattice don't both run the 2^n job
        self._cube_inflight: dict[frozenset[str], threading.Event] = {}
        self._num_rows: int | None = None
        self._num_distinct: int | None = None
        # Stats mirroring the reference's scan instrumentation
        # (entropy/IDataset.java:18-19 getNumDBScans/getTotalScanTime;
        # MasterCompressedDB totalNumQueriesIsuues/totalTimeSpentQuerying/
        # numOfTuplesProcessedDuringEntropyComputation): Spark jobs
        # launched, entropies produced, wall seconds inside Spark actions,
        # and input tuples fed into entropy jobs (rows x grouping-set
        # width). Guarded by _stats_lock — jobs can finish concurrently.
        self.jobs_run = 0
        self.entropies_computed = 0
        self.scan_seconds = 0.0
        self.tuples_processed = 0
        # grouping-sets pre-aggregation gate observability (round-7 ask:
        # "how often does the gate fire?") — chunks that aggregated once on
        # the union before the grouping sets vs chunks that ran direct
        self.pre_agg_chunks = 0
        self.direct_chunks = 0
        self._stats_lock = threading.Lock()
        if cache_input:
            # Iterative mining re-scans the relation constantly; persisting
            # the column-pruned input is the moral equivalent of the
            # reference ingesting into H2 once (CompressedDB.init).
            self.df = self.df.persist()

    # ----- cardinalities ---------------------------------------------------

    @property
    def num_rows(self) -> int:
        if self._num_rows is None:
            self._num_rows = self.df.count()
        return self._num_rows

    @property
    def num_distinct(self) -> int:
        """COUNT(*) of SELECT DISTINCT * (A16,
        `entropy/NewSmallDBInMemory.java:271-281`)."""
        if self._num_distinct is None:
            self._num_distinct = self.df.distinct().count()
        return self._num_distinct

    # ----- single-subset entropy ------------------------------------------

    def entropy(self, cols: Iterable[str] | str) -> float:
        """H(X), cached. Degenerate cases short-circuit without a scan:
        H(∅) = 0 (`ExternalFileDataSet.java:91-96`). Unlike the reference we
        do NOT assume H(R) = log2(N) for the full column set — that only
        holds for duplicate-free inputs; we compute it honestly and let the
        cache absorb the cost."""
        x = attrset(cols)
        hit = self._cache.get(x)
        if hit is not None:
            return hit
        if not x:
            return 0.0
        return self.entropies([x])[x]

    def _note_job(self, seconds: float, tuples: int, entropies: int) -> None:
        with self._stats_lock:
            self.jobs_run += 1
            self.entropies_computed += entropies
            self.scan_seconds += seconds
            self.tuples_processed += tuples

    def _compute_single(self, x: frozenset[str]) -> float:
        cols = sorted_cols(x, self.schema_cols)
        n = self.num_rows
        gb = self.df.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
        t0 = time.monotonic()
        row = gb.agg(
            F.sum(F.col("cnt") * F.log2("cnt")).alias("clogc")
        ).first()
        self._note_job(time.monotonic() - t0, n, 1)
        clogc = row["clogc"] or 0.0
        return math.log2(n) - clogc / n if n > 0 else 0.0

    # ----- batched entropies (A8) -------------------------------------------

    def entropies(self, subsets: Iterable[Iterable[str]],
                  strategy: str = "grouping_sets") -> dict[frozenset[str], float]:
        """Compute H(X) for many subsets; returns {frozenset: H}.

        strategy='grouping_sets': chunks of <= max_grouping_sets subsets per
        Spark job via GROUP BY GROUPING SETS — one scan + one shuffle per
        chunk regardless of subset count.
        strategy='concurrent': one groupBy job per subset submitted from a
        thread pool against the persisted input — wins when subsets are few
        and wide (grouping-set row replication would dominate).
        """
        wanted = [attrset(s) for s in subsets]
        pending = [x for x in dict.fromkeys(wanted) if x]
        while pending:
            todo: list[frozenset[str]] = []
            waits: list[threading.Event] = []
            with self._lock:
                for x in pending:
                    if x in self._cache:
                        continue
                    ev = self._inflight.get(x)
                    if ev is not None:
                        waits.append(ev)  # another thread is computing it
                    else:
                        todo.append(x)
                if todo:
                    batch_ev = threading.Event()
                    for x in todo:
                        self._inflight[x] = batch_ev
            if todo:
                try:
                    if strategy == "concurrent":
                        self._batch_concurrent(todo)
                    else:
                        # smallest subsets first: the singles chunk runs
                        # before wider sets, so its entropies seed the
                        # perplexity estimates that unlock pre-aggregation
                        # and cost-budgeting for every later chunk (chunks
                        # are planned LAZILY against the live cache)
                        remaining = sorted(todo, key=len)
                        while remaining:
                            if self.stop_check is not None and self.stop_check():
                                raise MiningCancelled(
                                    "entropy batch cancelled by stop flag")
                            chunk = self._next_chunk(remaining)
                            taken = set(chunk)  # subsequence, not prefix
                            remaining = [x for x in remaining
                                         if x not in taken]
                            self._batch_grouping_sets(chunk)
                finally:
                    # always release waiters, even on failure/cancel — they
                    # re-check the cache and recompute what's still missing
                    with self._lock:
                        for x in todo:
                            self._inflight.pop(x, None)
                    batch_ev.set()
            for ev in waits:
                ev.wait()
            with self._lock:
                pending = [x for x in pending if x not in self._cache]
            if pending and not todo and not waits:  # pragma: no cover
                raise RuntimeError("entropy batch made no progress")
        return {x: (0.0 if not x else self._cache[x]) for x in wanted}

    def _est_log2_groups(self, x: frozenset[str]) -> float | None:
        """Cache-derived upper bound on log2(#groups of X), or None when the
        cache can't say: subadditivity gives H(X) <= sum H(c) over X's
        singletons, and #distinct groups >= 2^H only in the uniform limit —
        but as a *budgeting* signal 2^H is the effective (perplexity) group
        count, which is what sizes the shuffle. Optimistic on cold caches by
        design: unknown subsets cost nothing toward the budget, so cold
        batches keep the full width."""
        total = 0.0
        with self._lock:
            for c in x:
                h = self._cache.get(frozenset((c,)))
                if h is None:
                    return None
                total += h
        n = self.num_rows
        return min(total, math.log2(n)) if n > 0 else total

    def _next_chunk(self, todo: list[frozenset[str]]) -> list[frozenset[str]]:
        """Width-capped, cost-aware chunking (VERDICT r2 'what's wrong' #3),
        planned ONE chunk at a time so each chunk's estimates see every
        entropy the previous chunks just cached: each grouping set
        replicates every input row into the shuffle, so a chunk's shuffle
        OUTPUT is ~ sum of its subsets' group counts. Cap chunks at
        max_grouping_sets AND at a group budget of ``group_budget_rows x
        num_rows`` using cache-derived estimates, so 16 near-key subsets
        don't ride in one job shuffling 16x the distinct rows. Estimates
        are optimistic when unknown — cold-cache behavior is exactly the
        old fixed-width chunking.

        Returns a SUBSEQUENCE of todo, seeded by its head (r7 rework; was
        a strict prefix): when the chunk-so-far qualifies for the
        pre-aggregation gate (union perplexity <= N/8, see
        _batch_grouping_sets), subsets that would push the union over the
        threshold are SKIPPED — not chunk-terminating — so compact-union
        chunks pack fully and every wide (high-perplexity) subset
        congregates into its own later chunk instead of dragging each
        compact chunk onto the direct path. Measured at sf10 batch32:
        prefix chunking fired the gate on 1 of 4 chunks, subsequence
        chunking on 3 of 4 (the 4th is the cold singleton seeding chunk),
        116 s -> ~80 s."""
        n = self.num_rows
        budget = self.group_budget_rows * n
        # pre-agg qualification threshold in bits (see _batch_grouping_sets:
        # chunks whose UNION-column perplexity is <= N/8 aggregate once on
        # the union before the grouping sets)
        thresh_bits = math.log2(n / 8.0) if n >= 8 else None
        if not todo:
            return []
        head = todo[0]
        cur: list[frozenset[str]] = [head]
        est0 = self._est_log2_groups(head)
        cur_mass = (2.0 ** est0) if est0 is not None else 0.0
        cur_union: set[str] = set(head)
        # Cold-wide clamp (ADVICE r14): a chunk headed by a WIDE set with
        # no cached estimate is budget-blind (every unknown set costs 0
        # toward the group budget), so the r14 width raise 16 -> 32 would
        # double the worst-case partial-agg working set exactly where the
        # budget can't see. Clamp such chunks to the old width of 16 —
        # the reference's RangeSize ceiling. Batches with singletons are
        # unaffected (singles seed estimates first, so every later chunk
        # is warm and keeps the full width).
        width_cap = self.max_grouping_sets
        if est0 is None and len(head) > 1:
            width_cap = min(width_cap, 16)

        def union_compact() -> bool:
            if thresh_bits is None:
                return False
            e = self._est_log2_groups(frozenset(cur_union))
            return e is not None and e <= thresh_bits

        for x in todo[1:]:
            if len(cur) >= width_cap:
                break
            est = self._est_log2_groups(x)
            # singletons never share a chunk with wider unknown-estimate
            # sets: running them alone first costs |cols| x N replication
            # instead of width x N, and their entropies are exactly what
            # unlocks pre-aggregation for every later chunk
            if len(cur[0]) == 1 and len(x) > 1 and est is None:
                continue
            # union-compactness: if the chunk as built qualifies for
            # pre-aggregation, skip a set that would push the union's
            # estimate over the threshold — it lands in a later chunk with
            # its fellow wide sets; two compact pre-agged chunks beat one
            # wide chunk that replicates N rows per set
            if union_compact():
                new_est = self._est_log2_groups(frozenset(cur_union | x))
                if new_est is not None and new_est > thresh_bits:
                    continue
            mass = (2.0 ** est) if est is not None else 0.0
            if budget > 0 and cur_mass + mass > budget:
                break
            cur.append(x)
            cur_mass += mass
            cur_union |= x
        return cur

    def _batch_grouping_sets(self, subsets: list[frozenset[str]]) -> None:
        if len(subsets) == 1:
            # run the Spark job OUTSIDE the lock: concurrent miner threads
            # must not serialize behind a blocking job (they only need the
            # lock for the cache store itself)
            x = subsets[0]
            h = self._compute_single(x)
            with self._lock:
                self._cache[x] = h
            return
        union_cols: list[str] = []
        seen_cols: set[str] = set()
        for x in subsets:
            for c in sorted_cols(x, self.schema_cols):
                if c not in seen_cols:
                    seen_cols.add(c)
                    union_cols.append(c)
        if len(union_cols) > 62:
            # gid arithmetic below needs one bigint bit per union column;
            # beyond 62 split the batch rather than overflow
            mid = len(subsets) // 2
            self._batch_grouping_sets(subsets[:mid])
            self._batch_grouping_sets(subsets[mid:])
            return
        n = self.num_rows
        # bit i (MSB-first over union_cols) is 1 when that column is
        # aggregated away (absent from the set)
        def gid_of(x: frozenset[str]) -> int:
            g = 0
            for c in union_cols:
                g = (g << 1) | (0 if c in x else 1)
            return g

        gid_to_set = {gid_of(x): x for x in subsets}
        sets_sql = ", ".join(
            "(" + ", ".join(f"`{c}`" for c in sorted_cols(x, self.schema_cols)) + ")"
            for x in subsets
        )
        # build gid from explicit grouping(col) flags with OUR bit
        # assignment — never from bare grouping_id(), whose bit positions
        # follow Spark's internal expression ordering and could silently
        # reassign same-size subsets if that ordering ever changes
        nbits = len(union_cols)
        gid_expr = " + ".join(
            f"(cast(grouping(`{c}`) as bigint) * {1 << (nbits - 1 - i)})"
            for i, c in enumerate(union_cols))
        # unique per call: id()-derived names can collide across recycled
        # objects, silently aiming the SQL at another engine's relation
        view = f"__rd_entropy_{uuid.uuid4().hex[:12]}"
        self.df.createOrReplaceTempView(view)
        # Pre-aggregation gate: GROUPING SETS replicates every INPUT row
        # once per set (a 16-set chunk pushes 16N rows into partial
        # aggregation). When the cached perplexity estimate says the union
        # columns' effective group count G is far below N, aggregate ONCE
        # on the union (N -> ~G rows) and run the grouping sets over the
        # compressed counts — sum(cnt) per set is identical to count(1) on
        # the raw rows (null column values group the same way; the
        # grouping() flags that build gid are unaffected). Conservative by
        # construction: cold caches or wide unions (est ~ log2 N) keep the
        # direct path, and a wrong estimate costs one extra aggregation,
        # never correctness. Gate factor 8 = require est G <= N/8.
        est_union = self._est_log2_groups(frozenset(union_cols))
        pre_agg = (est_union is not None and n > 0
                   and (2.0 ** est_union) * 8.0 <= n)
        with self._stats_lock:
            if pre_agg:
                self.pre_agg_chunks += 1
            else:
                self.direct_chunks += 1
        if pre_agg:
            cols_sql = ", ".join(f"`{c}`" for c in union_cols)
            src = (f"(SELECT {cols_sql}, count(1) AS __base_cnt "
                   f"FROM {view} GROUP BY {cols_sql})")
            cnt_expr = "sum(__base_cnt)"
        else:
            src, cnt_expr = view, "count(1)"
        inner = (
            f"SELECT ({gid_expr}) AS gid, {cnt_expr} AS cnt FROM {src} "
            f"GROUP BY GROUPING SETS ({sets_sql})"
        )
        outer = (
            f"SELECT gid, sum(cnt * log2(cnt)) AS clogc "
            f"FROM ({inner}) GROUP BY gid"
        )
        t0 = time.monotonic()
        try:
            rows = self.df.sparkSession.sql(outer).collect()
        finally:
            self.df.sparkSession.catalog.dropTempView(view)
        self._note_job(time.monotonic() - t0, n * len(subsets), 0)
        got = {}
        for r in rows:
            x = gid_to_set.get(r["gid"])
            if x is None:
                continue  # duplicate-set gid collision impossible; ignore strays
            clogc = r["clogc"] or 0.0
            got[x] = math.log2(n) - clogc / n if n > 0 else 0.0
        missing = [x for x in subsets if x not in got]
        # A grouping set over an empty relation yields no rows; only possible
        # when n == 0 — define H = 0 there.
        for x in missing:
            got[x] = 0.0 if n == 0 else self._compute_single(x)
        with self._lock:
            self._cache.update(got)
        with self._stats_lock:
            self.entropies_computed += len(got)

    def key_columns(self, cols: Iterable[str]) -> frozenset[str]:
        """Columns whose single-column entropy equals log2(N) EXACTLY — i.e.
        unique keys (every group size 1). Exact in floating point: a key's
        correction term sum(c*log2(c)) is identically 0.0, so H is the very
        float ``math.log2(n)``; a non-key has clogc >= 2.0, and 2/N stays
        above one ulp of log2(N) for any N below ~3e14 rows (and beyond that
        the difference is sub-ulp, so calling it a key is within 1 ulp of
        correct anyway). Computes the singletons (one chunked job) if not
        already cached."""
        cols = list(cols)
        n = self.num_rows
        if n <= 0:
            return frozenset()
        self.entropies([frozenset((c,)) for c in cols])
        logn = math.log2(n)
        with self._lock:
            return frozenset(c for c in cols
                             if self._cache[frozenset((c,))] == logn)

    def _cube_job(self, cols: list[str]) -> dict[frozenset[str], float]:
        """One CUBE scan+shuffle computing H(X) for every subset of `cols`.
        No memoization — callers coordinate."""
        n = self.num_rows
        out: dict[frozenset[str], float] = {frozenset(): 0.0}
        if not cols or n == 0:
            return out
        quoted = ", ".join(f"`{c}`" for c in cols)
        # explicit grouping(col) flags, same rationale as _batch_grouping_sets
        gid_expr = " + ".join(
            f"(cast(grouping(`{c}`) as bigint) * {1 << (len(cols) - 1 - i)})"
            for i, c in enumerate(cols))
        view = f"__rd_cube_{uuid.uuid4().hex[:12]}"
        self.df.createOrReplaceTempView(view)
        t0 = time.monotonic()
        try:
            rows = self.df.sparkSession.sql(
                f"SELECT gid, sum(cnt * log2(cnt)) AS clogc FROM "
                f"(SELECT ({gid_expr}) AS gid, count(1) AS cnt FROM {view} "
                f" GROUP BY CUBE ({quoted})) GROUP BY gid"
            ).collect()
        finally:
            self.df.sparkSession.catalog.dropTempView(view)
        self._note_job(time.monotonic() - t0, n * (1 << len(cols)), 0)
        for r in rows:
            gid = r["gid"]
            # bit i (MSB-first over cols) set => column aggregated away
            x = frozenset(c for i, c in enumerate(cols)
                          if not (gid >> (len(cols) - 1 - i)) & 1)
            clogc = r["clogc"] or 0.0
            out[x] = math.log2(n) - clogc / n
        return out

    def all_entropies(self, cols: Iterable[str] | None = None) -> dict[frozenset[str], float]:
        """A11: eagerly materialize H(X) for EVERY subset of `cols` — the
        analogue of the reference's level-wise computeAllEntropies
        (`entropy/CompressedDB.java:392-431`), which builds every subset
        table bottom-up in H2.

        Key-column shortcut: H(S) = log2(N) exactly for any S containing a
        unique-key column (all groups stay size 1 under refinement), so the
        singletons are computed first (one cheap chunked job), key columns
        detected by exact float equality (see ``key_columns``), and the CUBE
        runs only over the non-key columns. Every key-containing subset is
        filled algebraically. For a relation with k key columns this cuts
        the CUBE's row replication from 2^n to 2^(n-k) per input row AND
        removes precisely the grouping sets whose group count equals N (the
        ones hash aggregation cannot reduce) from the shuffle — measured 4x
        on the sf1 denorm, where half the lattice contains c_custkey/c_name.

        Scale: row replication is 2^(n-k) per input row — only sane for
        n-k <= ~12 low-cardinality columns (the reference's use case:
        UCI-style categorical tables). For wider relations use lazy
        entropies()."""
        cols = list(cols) if cols is not None else list(self.schema_cols)
        if len(cols) > 20:
            raise ValueError(f"cube over {len(cols)} columns would replicate "
                             f"rows 2^{len(cols)}x; use entropies() instead")
        key = frozenset(cols)
        # coordinate with concurrent callers via the same Event pattern as
        # entropies(): only one thread runs the 2^n CUBE job, the rest wait
        while True:
            with self._lock:
                if key in self._cubes_done:  # memoized: serve the whole lattice
                    return {x: self._cache[x]
                            for x in map(frozenset, _powerset(cols))}
                ev = self._cube_inflight.get(key)
                if ev is None:
                    ev = threading.Event()
                    self._cube_inflight[key] = ev
                    break
            ev.wait()
        try:
            n = self.num_rows
            if n == 0:
                out = {frozenset(s): 0.0 for s in _powerset(cols)}
            else:
                keycols = self.key_columns(cols)
                rest = [c for c in cols if c not in keycols]
                out = self._cube_job(rest)
                if keycols:
                    logn = math.log2(n)
                    for s in _powerset(cols):
                        fs = frozenset(s)
                        if fs & keycols:
                            out[fs] = logn
            with self._lock:
                self._cache.update(out)
                self._cubes_done.add(key)
            with self._stats_lock:
                self.entropies_computed += len(out)
            return out
        finally:
            # release waiters even on failure/cancel; they re-check
            # _cubes_done and, if the job failed, one of them retries
            with self._lock:
                self._cube_inflight.pop(key, None)
            ev.set()

    def _batch_concurrent(self, subsets: list[frozenset[str]]) -> None:
        _ = self.num_rows  # materialize before fan-out
        # propagate the caller's job group: groups are per-Python-thread, so
        # cancellation would otherwise miss these fanned-out jobs
        sc = self.df.sparkSession.sparkContext
        group = sc.getLocalProperty("spark.jobGroup.id")
        desc = sc.getLocalProperty("spark.job.description")

        def compute(x):
            if self.stop_check is not None and self.stop_check():
                raise MiningCancelled(
                    "entropy batch cancelled by stop flag")
            if group is not None:
                sc.setJobGroup(group, desc, interruptOnCancel=True)
            return self._compute_single(x)

        with ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(compute, subsets))
        with self._lock:
            for x, h in zip(subsets, results):
                self._cache[x] = h

    # ----- cache management -------------------------------------------------

    @property
    def cache_size(self) -> int:
        return len(self._cache)

    def preload(self, values: dict[frozenset[str], float]) -> None:
        with self._lock:
            self._cache.update(values)

    def unpersist(self) -> None:
        self.df.unpersist()
