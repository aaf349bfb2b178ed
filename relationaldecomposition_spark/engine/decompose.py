"""Decomposition validation: spurious-tuple counting + normalized output.

Re-expresses the reference's SQLite-based validators Spark-first:

- A12 cluster projection: ``SELECT DISTINCT cols, CAST(1 AS BIGINT) cnt``
  (`entropy/NewSmallDBInMemory.java:481-502`) → ``df.select(*cols)
  .distinct()`` + a literal count column.
- A13 Yannakakis-style pairwise fold with count aggregation
  (`entropy/NewSmallDBInMemory.java:354-452` proccessDecomposition): join
  the running relation with the next cluster projection on their shared
  attributes, keep SUM(cnt1*cnt2) grouped by exactly the attributes still
  needed by the remaining clusters. The final SUM(cnt) is the size of the
  full natural join; spurious = that − |distinct base|.
- A14 join-tree ordering (`entropy/SmallDBInMemory.java:496-681`): same
  fold, ordered leaf→root — here, a greedy max-shared-attributes order that
  avoids cartesian intermediates (the result is order-invariant; only the
  plan changes).
- A15 naive multi-way join + DISTINCT count
  (`entropy/SmallDBInMemory.java:207-334` testDecomposition): kept as a
  test oracle.
- A16 distinct base count (`entropy/NewSmallDBInMemory.java:271-281`).
- A21 DecompositionInfo metrics (`entropy/NewSmallDBInMemory.java:547-576`).

Duplicate-row semantics follow the reference's validation path: the base
relation is deduplicated before anything else (worker copies are
``SELECT DISTINCT *``, `NewSmallDBInMemory.java:180-187`).

Scale notes (100 TB):
- Each projection is one shuffle on its own columns (column-pruned scan of
  a persisted dedup'd base). Projection row counts are computed anyway for
  DecompositionInfo, so the fold broadcasts any side known to be small —
  exactly the "broadcast small dims" rule, driven by real counts instead of
  stats guesses. AQE handles skewed join keys.
- The group-by after every join keeps intermediates at most as wide as the
  union of remaining separators — the Yannakakis guarantee that
  intermediate size is bounded by output size for acyclic decompositions.
- The fold never collects anything but per-cluster counts and one final
  scalar.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..core.attrset import attrset, sorted_cols

# Broadcast a fold side when its (exactly known) distinct row count is below
# this. ~1M narrow rows ≈ tens of MB serialized: safely under default
# executor memory while saving a shuffle of the big side.
BROADCAST_MAX_ROWS = 1_000_000


class DecompositionCanceled(RuntimeError):
    """Raised when a should_stop callable interrupts a validation run."""


@dataclass
class DecompositionInfo:
    """Mirror of `entropy/NewSmallDBInMemory.java:547-576`."""

    smallest_relation: int = -1
    largest_relation: int = -1
    total_tuples: int = 0
    total_cells: int = 0
    spurious_tuples: int = 0
    cluster_sizes: dict = field(default_factory=dict)

    def add(self, cluster: frozenset[str], count: int) -> None:
        if self.smallest_relation < 0 or count < self.smallest_relation:
            self.smallest_relation = count
        if count > self.largest_relation:
            self.largest_relation = count
        self.total_tuples += count
        self.total_cells += count * len(cluster)
        self.cluster_sizes[tuple(sorted(cluster))] = count


def project_cluster(base: DataFrame, cluster, schema_cols=None,
                    with_cnt: bool = True) -> DataFrame:
    """A12: distinct projection of one cluster, with the literal cnt column
    the count-fold multiplies through."""
    cols = sorted_cols(attrset(cluster), schema_cols or base.columns)
    proj = base.select(*cols).distinct()
    if with_cnt:
        proj = proj.withColumn("cnt", F.lit(1).cast("bigint"))
    return proj


def _greedy_order(clusters: list[frozenset[str]]) -> list[frozenset[str]]:
    """Order clusters so each join shares attributes with the accumulated
    set when possible (message-passing order for connected join trees);
    falls back to the largest-overlap-first heuristic on ties."""
    remaining = list(clusters)
    # start with the largest cluster: biggest side stays un-broadcast first
    start = max(remaining, key=len)
    remaining.remove(start)
    order = [start]
    acc = set(start)
    while remaining:
        best = max(remaining, key=lambda c: (len(acc & c), -len(c)))
        remaining.remove(best)
        order.append(best)
        acc |= best
    return order


class DecompositionValidator:
    """Spurious-tuple counting for a set of clusters over one relation."""

    def __init__(self, df: DataFrame, broadcast_max_rows: int = BROADCAST_MAX_ROWS):
        self.schema_cols = tuple(df.columns)
        # validation-path semantics: dedup the base once, keep it hot
        self.base = df.distinct().persist()
        self._num_tuples: int | None = None
        self.broadcast_max_rows = broadcast_max_rows
        # refcounted cluster-projection cache shared across (possibly
        # CONCURRENT) process_decomposition calls: candidate schemas
        # routinely share clusters, and two threads persisting the same
        # projection plan double-persist it (WARN CacheManager) and race
        # its materialization (WARN BlockManager). Sharing the frame
        # computes each distinct projection once; the refcount keeps the
        # leak-free invariant (unpersist when the last user releases).
        self._projs: dict[frozenset, dict] = {}
        self._plock = threading.Lock()

    def _acquire_proj(self, c: frozenset) -> dict:
        """Take a reference on cluster c's persisted projection entry
        {"df", "refs", "count"} — create+persist on first use."""
        with self._plock:
            ent = self._projs.get(c)
            if ent is None:
                ent = {"df": project_cluster(self.base, c,
                                             self.schema_cols).persist(),
                       "refs": 0, "count": None,
                       # serializes the FIRST materialization: two schema
                       # validations sharing a cluster would otherwise
                       # count the same persisted frame concurrently and
                       # double-compute its partitions ("Block already
                       # exists" BlockManager warnings, wasted work)
                       "mlock": threading.Lock()}
                self._projs[c] = ent
            ent["refs"] += 1
            return ent

    def _release_proj(self, c: frozenset) -> None:
        # unpersist INSIDE the lock: Spark's CacheManager keys entries by
        # logical plan, so an unpersist issued after dropping the lock can
        # race a concurrent _acquire_proj persisting an identical-plan
        # frame and evict the fresh entry (recompute, perf-only). Blocking
        # is false, so holding the lock across the call is cheap.
        with self._plock:
            ent = self._projs[c]
            ent["refs"] -= 1
            if ent["refs"] == 0:
                del self._projs[c]
                ent["df"].unpersist()

    @property
    def num_tuples(self) -> int:
        """A16: |SELECT DISTINCT * FROM base|."""
        if self._num_tuples is None:
            self._num_tuples = self.base.count()
        return self._num_tuples

    # -- A13/A14 count fold ---------------------------------------------------

    def process_decomposition(self, clusters, order: str = "greedy",
                              should_stop=None) -> DecompositionInfo:
        """Join-size counting fold (proccessDecomposition). Returns
        DecompositionInfo with spurious_tuples = |⋈ projections| − |base|.

        ``should_stop``: optional callable polled between Spark actions —
        cancelJobGroup only kills in-flight jobs, so without this check a
        canceled run would still launch the remaining fold joins."""
        stop = should_stop or (lambda: False)
        cl = [attrset(c) for c in clusters]
        info = DecompositionInfo()
        if not cl:
            return info
        if order == "greedy":
            cl = _greedy_order(cl)

        counts: dict[frozenset[str], int] = {}
        entries: dict[frozenset[str], dict] = {}
        # try/finally: a cancellation (DecompositionCanceled) or Spark failure
        # anywhere — including while building/persisting the projections
        # themselves — must not leak persisted projections into executor
        # storage; DecompositionService resubmits CANCELED/FAILED jobs, so a
        # long-lived service would accumulate them. Projections come from
        # the validator-level refcounted cache (shared with concurrent
        # validations of schemas having clusters in common).
        try:
            for c in cl:
                entries[c] = self._acquire_proj(c)
            projs = {c: e["df"] for c, e in entries.items()}
            # materialize + count all projections concurrently: each count is
            # an independent job over the cached base, so latency overlaps.
            # Job groups are per-Python-thread in PySpark, so re-apply the
            # caller's group inside each worker or cancellation would miss
            # these jobs.
            from concurrent.futures import ThreadPoolExecutor
            sc = self.base.sparkSession.sparkContext
            group = sc.getLocalProperty("spark.jobGroup.id")
            desc = sc.getLocalProperty("spark.job.description")

            def count_one(c):
                if stop():
                    raise DecompositionCanceled("canceled before projection count")
                ent = entries[c]
                if ent["count"] is not None:
                    return ent["count"]
                # double-checked per-entry lock: only ONE thread runs the
                # materializing count; concurrent validations sharing the
                # cluster wait and reuse the cached blocks instead of
                # re-computing them (BlockManager "already exists" race)
                with ent["mlock"]:
                    if ent["count"] is not None:
                        return ent["count"]
                    if group is not None:
                        sc.setJobGroup(group, desc, interruptOnCancel=True)
                    n = projs[c].count()
                    ent["count"] = n
                return n

            with ThreadPoolExecutor(max_workers=min(8, len(cl))) as pool:
                for c, n in zip(cl, pool.map(count_one, cl)):
                    counts[c] = n
                    info.add(c, n)

            if stop():
                raise DecompositionCanceled("canceled before final aggregate")
            row = self._fold_total_frame(cl, counts, projs).first()
            total = row["total"] or 0
        finally:
            for c in entries:
                self._release_proj(c)
        info.spurious_tuples = int(total) - self.num_tuples
        return info

    def _fold_total_frame(self, cl, counts, projs) -> DataFrame:
        """The LAZY join-size fold: a single-row DataFrame with column
        ``total`` = |⋈ projections| for the (already greedy-ordered)
        cluster list. Extracted from process_decomposition so callers
        validating SEVERAL candidate schemas can union the per-schema
        totals into ONE Spark action (validate_schemas_concurrent): the
        fold is join/agg plan construction only — no action — and on
        tiny-per-action workloads the scheduling latency of one action
        per candidate dominated wall time (the spurious_fold floor note
        in bench.py)."""
        acc_attrs = cl[0]
        acc = projs[cl[0]]
        acc_count = counts[cl[0]]
        for i in range(1, len(cl)):
            c2 = cl[i]
            p2 = projs[c2].withColumnRenamed("cnt", "cnt_r")
            join_cols = sorted_cols(acc_attrs & c2, self.schema_cols)
            new_attrs = acc_attrs | c2
            # attributes still needed: anything a remaining cluster mentions
            needed = frozenset().union(*cl[i + 1:]) if i + 1 < len(cl) else frozenset()
            group_cols = sorted_cols(needed & new_attrs, self.schema_cols)

            left, right = acc, p2
            if counts[c2] <= self.broadcast_max_rows:
                right = F.broadcast(right)
            elif acc_count <= self.broadcast_max_rows:
                left = F.broadcast(left)
            joined = (left.join(right, on=join_cols) if join_cols
                      else left.crossJoin(right))
            prod = (F.sum(F.col("cnt") * F.col("cnt_r"))).alias("cnt")
            if group_cols:
                acc = joined.groupBy(*group_cols).agg(prod)
            else:
                acc = joined.agg(prod)
            acc_attrs = new_attrs
            # after the group-by the running count is unknown; disable
            # count-based broadcast of the accumulator from here on (AQE
            # still upgrades it at runtime if it turns out small)
            acc_count = self.broadcast_max_rows + 1
        return acc.agg(F.sum("cnt").alias("total"))

    # -- A15 naive oracle -----------------------------------------------------

    def naive_join_spurious(self, clusters) -> int:
        """Test oracle: natural-join all projections, DISTINCT, count, minus
        base count (testDecomposition)."""
        cl = [attrset(c) for c in clusters]
        cl = _greedy_order(cl)
        dfs = [project_cluster(self.base, c, self.schema_cols, with_cnt=False)
               for c in cl]

        def nat_join(a, b):
            shared = sorted_cols(set(a.columns) & set(b.columns), self.schema_cols)
            return a.join(b, on=shared) if shared else a.crossJoin(b)

        joined = reduce(nat_join, dfs)
        return joined.distinct().count() - self.num_tuples

    def close(self) -> None:
        with self._plock:
            leaked = list(self._projs.values())
            self._projs.clear()
        for ent in leaked:
            ent["df"].unpersist()
        self.base.unpersist()


def _remove_orphan_table_location(spark, name: str) -> None:
    """Delete a local warehouse directory for `name` that no catalog entry
    owns (leftover from another session). file:-scheme paths only. `name`
    derives from a caller-supplied table prefix, so it is validated as a
    plain identifier and the resolved path is required to stay inside the
    warehouse dir — a prefix containing '/' or '..' must never escape."""
    import os
    import re
    import shutil
    from urllib.parse import urlparse

    if not re.fullmatch(r"[A-Za-z0-9_]+", name):
        return
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme not in ("", "file") or not wh.path:
        return
    root = os.path.realpath(wh.path)
    loc = os.path.realpath(os.path.join(root, name.lower()))
    if os.path.dirname(loc) == root and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_decomposition_bucketed(df: DataFrame, clusters, join_key: str,
                                 table_prefix: str, num_buckets: int = 32) -> list[str]:
    """Scale variant of the ETL writer: materialize each cluster projection
    as a bucketed+sorted table on the join key, so downstream rejoins of the
    normalized tables are co-located — sort-merge join with NO exchange on
    either side (pinned by tests/test_plans.py). This is the 100 TB answer
    to 'the decomposition will be re-joined constantly': pay the shuffle
    once at write time.

    Only clusters containing ``join_key`` are bucketed; others are written
    unbucketed. Returns the created table names (input order).

    The per-cluster writes run CONCURRENTLY (round-8): each is an
    independent distinct+shuffle+write over the shared persisted base
    whose wall-clock is dominated by job scheduling and the write
    barrier, not executor saturation — three sf0.1 cluster writes
    measure ~5 s sequential vs ~2 s overlapped. Table names are disjoint
    per worker, so the DROP/orphan-cleanup prologue never races on the
    same location; PySpark job groups are per-thread, so the caller's
    group is re-applied inside each worker (cancellation would otherwise
    miss these jobs)."""
    from concurrent.futures import ThreadPoolExecutor

    base = df.distinct().persist()
    spark = df.sparkSession
    sc = spark.sparkContext
    group = sc.getLocalProperty("spark.jobGroup.id")
    desc = sc.getLocalProperty("spark.job.description")
    clusters = list(clusters)

    def write_one(item):
        i, cluster = item
        if group is not None:
            sc.setJobGroup(group, desc, interruptOnCancel=True)
        cols = sorted_cols(attrset(cluster), df.columns)
        name = f"{table_prefix}_cluster_{i:03d}"
        # mode("overwrite") only replaces tables THIS catalog knows;
        # a managed-table directory left by a previous session (local
        # in-memory catalog, surviving warehouse dir) fails CTAS with
        # LOCATION_ALREADY_EXISTS — drop the entry and any orphaned
        # local location first. Real metastores never orphan.
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        _remove_orphan_table_location(spark, name)
        writer = base.select(*cols).distinct().write.mode("overwrite")
        if join_key in cols:
            writer = writer.bucketBy(num_buckets, join_key).sortBy(join_key)
        writer.saveAsTable(name)
        return name

    try:
        with ThreadPoolExecutor(
                max_workers=min(4, max(1, len(clusters)))) as pool:
            # submit (not map) so the first failure cancels every
            # not-yet-started write — pool.map would let already-queued
            # writes run to completion during shutdown, leaving an
            # unreported mix of created tables (advisor, round 8).
            futures = [pool.submit(write_one, item)
                       for item in enumerate(clusters)]
            try:
                names = [f.result() for f in futures]
            except BaseException:
                for f in futures:
                    f.cancel()
                raise
    finally:
        base.unpersist()
    return names


def write_decomposition(df: DataFrame, clusters, base_path: str,
                        fmt: str = "parquet") -> dict[str, int]:
    """The ETL deliverable: materialize each cluster projection as a table
    (normalization as a schema transformation). Returns {path: row_count}.

    Each output is a distinct projection — one shuffle per cluster — written
    columnar so downstream reads prune and push down.
    """
    base = df.distinct().persist()
    out: dict[str, int] = {}
    try:
        for i, cluster in enumerate(clusters):
            cols = sorted_cols(attrset(cluster), df.columns)
            # persist so the count doesn't recompute the distinct projection
            # the write just materialized
            proj = base.select(*cols).distinct().persist()
            path = f"{base_path}/cluster_{i:03d}"
            proj.write.mode("overwrite").format(fmt).save(path)
            out[path] = proj.count()
            proj.unpersist()
    finally:
        base.unpersist()
    return out
