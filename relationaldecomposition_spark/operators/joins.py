"""Custom join operators the reference (and vanilla SQL-92) lacks, built
as compositions of DataFrame ops so Catalyst keeps owning the physical
plan (per the Spark-first rule: no Pandas UDF unless built-ins can't
express the semantics — here they can).

asof_join: the time-series staple ("for each left row, the most recent
right row at-or-before it, per key"). The naive formulation is an
inequality join (quadratic per key, and Spark would plan a broadcast
nested loop or a sort-merge with a range condition); the scale-correct
distributed shape is UNION + WINDOW:

  1. tag left rows side=1 and right rows side=0, union them with aligned
     schemas (right payload columns are NULL on left rows and vice versa);
  2. one window per key ordered by (ts, side, tiebreak) with a running
     `last(payload, ignorenulls=True)` frame — at every left row that is
     exactly the latest right row with right_ts <= left_ts;
  3. keep side=1 rows.

Cost: ONE shuffle on the join key (the window), zero joins, no per-key
quadratic term — at 100 TB this is the same shape as a sessionization
pass. Skewed keys behave like any other wide window: the per-key sort is
O(n_k log n_k), not O(n_k^2).

Semantics matched to DuckDB's ASOF JOIN (the oracle): inclusive backward
match (right_ts <= left_ts; equal timestamps match because right rows
sort BEFORE left rows at the same instant), left-outer (unmatched left
rows keep NULL payload). `tiebreak` makes duplicate right timestamps
deterministic: the row with the greatest tiebreak value wins (last in
ascending order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_ts: str, right_ts: str, payload_cols: list[str],
              direction: str = "backward", tolerance_s: float | None = None,
              tiebreak: str | None = None,
              payload_prefix: str = "") -> DataFrame:
    """As-of join: enrich each left row with the temporally-nearest right
    row per key.

    direction='backward': latest right with right_ts <= left_ts (default).
    direction='forward':  earliest right with right_ts >= left_ts.
    tolerance_s: max |left_ts - right_ts| in seconds; matches further away
      are nulled out (the match is dropped, not the left row).
    tiebreak: right column deciding ties among equal right_ts (greatest
      wins); required for determinism if (key, right_ts) is not unique.
    payload_prefix: prepended to payload column names in the output (use
      when a payload name collides with a left column).

    Output: every left column, then <prefix><payload_cols...>, then
    <prefix>asof_ts (the matched right timestamp, NULL if no match)."""
    key = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    rtype = right.schema[right_ts].dataType
    pay = list(payload_cols)
    if tiebreak is not None and tiebreak not in pay:
        pay.append(tiebreak)
    lrow = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        *[F.col(k) for k in key],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtype).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in pay],
        lrow.alias("_l"))
    r = right.select(
        *[F.col(k) for k in key],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in pay],
        F.lit(None).cast(l.schema["_l"].dataType).alias("_l"))
    u = l.unionByName(r)
    # backward: ascending ts; right (side 0) before left at equal ts makes
    # the match inclusive. forward: descending ts, same side ordering. In
    # both cases `last()` over the cumulative frame picks the FINAL row in
    # sort order among the nearest right_ts group, so an ascending tiebreak
    # means the greatest tiebreak value wins.
    ts_ord = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    order = [ts_ord, F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())
    w = (Window.partitionBy(*key).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (u.select(
        "_side", "_ts", "_l",
        F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
          for c in payload_cols])
        .where(F.col("_side") == 1))
    if tolerance_s is not None:
        gap = F.abs(F.col("_ts").cast("double") - F.col("_m_ts").cast("double"))
        ok = F.col("_m_ts").isNotNull() & (gap <= F.lit(float(tolerance_s)))
        matched = matched.select(
            "_side", "_ts", "_l",
            F.when(ok, F.col("_m_ts")).alias("_m_ts"),
            *[F.when(ok, F.col(f"_m_{c}")).alias(f"_m_{c}")
              for c in payload_cols])
    return matched.select(
        "_l.*",
        *[F.col(f"_m_{c}").alias(f"{payload_prefix}{c}")
          for c in payload_cols],
        F.col("_m_ts").alias(f"{payload_prefix}asof_ts"))


def interval_join(points: DataFrame, intervals: DataFrame,
                  on: list[str] | str, ts_col: str,
                  start_col: str, end_col: str,
                  payload_cols: list[str], bucket_s: int,
                  payload_prefix: str = "") -> DataFrame:
    """Interval (range) join: every (point, interval) pair with the same
    key where start <= ts <= end (inclusive both ends) — one output row
    per matching pair, points inside k overlapping intervals emit k rows.

    Spark has no native range join, and the ON-BETWEEN formulation plans
    as a broadcast-nested-loop (quadratic per key). The scale-correct
    shape is BUCKETIZED EQUI-JOIN:

      1. choose a bucket width ~ the typical interval length;
      2. each interval explodes to the time buckets it overlaps
         (amplification = len/width + 1, bounded by construction);
      3. each point maps to exactly ONE bucket (no amplification on the
         big side);
      4. equi-join on (key..., bucket) — shuffle-partitionable, skew
         handled by AQE like any hash join — then the exact
         start <= ts <= end filter.

    A pair is emitted exactly once: the point's bucket intersects the
    interval's covered-bucket set at most once, so no post-join dedup.
    At 100 TB: one shuffle per side on (key, bucket); nothing quadratic.

    Output: every point column, then <prefix><payload_cols...>,
    <prefix>start, <prefix>end."""
    key = [on] if isinstance(on, str) else list(on)
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    w_us = int(bucket_s) * 1_000_000

    def bk(col):
        # cast handles TIMESTAMP_NTZ (unix_micros rejects it); both sides
        # go through the same conversion so bucket alignment is exact
        return F.floor(F.unix_micros(col.cast("timestamp")) / F.lit(w_us))

    p = points.select(
        F.struct(*points.columns).alias("_p"),
        *[F.col(k) for k in key],
        F.col(ts_col).alias("_ts"),
        bk(F.col(ts_col)).alias("_bk"))
    iv = intervals.select(
        *[F.col(k) for k in key],
        F.col(start_col).alias("_start"),
        F.col(end_col).alias("_end"),
        *[F.col(c).alias(f"_pay_{c}") for c in payload_cols],
    ).where(F.col("_start") <= F.col("_end")).select(
        "*",
        F.explode(F.sequence(bk(F.col("_start")), bk(F.col("_end"))))
        .alias("_bk"))
    j = p.join(iv, key + ["_bk"]) \
         .where((F.col("_ts") >= F.col("_start"))
                & (F.col("_ts") <= F.col("_end")))
    return j.select(
        "_p.*",
        *[F.col(f"_pay_{c}").alias(f"{payload_prefix}{c}")
          for c in payload_cols],
        F.col("_start").alias(f"{payload_prefix}start"),
        F.col("_end").alias(f"{payload_prefix}end"))


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Snapshot diff (the CDC / incremental-refresh staple): compare two
    versions of a keyed table and emit one row per difference —
    change='added' (key only in new), 'removed' (key only in old),
    'changed' (key in both, any compare column differing under
    null-safe comparison). Unchanged keys emit nothing.

    One full-outer shuffle join on the keys; column comparison is a
    map-side expression. At 100 TB both snapshots shuffle once — the same
    cost as the merge that would consume this diff. Assumes keys are
    unique per snapshot (dedupe upstream — diffing multisets is a
    different operator).

    Returns (key..., change, old_<c>..., new_<c>...)."""
    o = old.select(*[F.col(k) for k in key_cols],
                   F.lit(1).alias("_in_old"),
                   *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    n = new.select(*[F.col(k) for k in key_cols],
                   F.lit(1).alias("_in_new"),
                   *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    j = o.join(n, key_cols, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (F.when(F.col("_in_old").isNull(), "added")
               .when(F.col("_in_new").isNull(), "removed")
               .when(differs, "changed"))
    return (j.withColumn("change", change)
             .where(F.col("change").isNotNull())
             .select(*key_cols, "change",
                     *[f"old_{c}" for c in compare_cols],
                     *[f"new_{c}" for c in compare_cols]))
