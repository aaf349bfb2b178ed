"""Statistical profiling operators: exact per-group quantiles and numeric
column profiles — the data-quality / drift-monitoring pass a training-data
pipeline runs per source and per snapshot.

Parity notes (both operators are oracle-gated):
- Spark's exact `percentile` and DuckDB's `quantile_cont` implement the
  same linear interpolation (p = q*(n-1)); measured bit-identical on the
  gate data, with round6 guarding the last ulp.
- Floating sums are partition-order-dependent (never cross-engine-stable),
  so the profiler sums through DECIMAL(28,6) — exact and associative in
  both engines — and divides back in double for the mean.

Scale notes (100 TB):
- group_quantiles: one hash aggregation keyed by the group columns; exact
  percentile buffers each group's values on the reducer — right for
  bounded group sizes (a profile per source/day). For unbounded groups
  switch to approx_percentile (sketch-mergeable, map-side combining);
  that variant is non-deterministic across engines so it stays out of
  the oracle gate.
- profile_numeric: algebraic aggregates only (sum/count/min/max +
  count-distinct), all map-side combining; one shuffle keyed by group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import round6, sql_round6

PROFILE_DEC = "decimal(28,6)"


def group_quantiles(df: DataFrame, keys: list[str], value_col: str,
                    qs: list[float]) -> DataFrame:
    """Exact per-group quantiles (linear interpolation), long format: one
    row per (group, q) — (keys..., q, quantile)."""
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError("qs must be fractions in [0, 1]")
    arr = ",".join(repr(float(q)) for q in qs)
    agg = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, array({arr}))").alias("_p"))
    qlit = F.array(*[F.lit(float(q)) for q in qs])
    ex = agg.select(*keys, F.posexplode(qlit).alias("_i", "q"), F.col("_p"))
    return ex.select(*keys, "q",
                     round6(F.col("_p")[F.col("_i")]).alias("quantile"))


def sql_group_quantiles(table: str, keys: list[str], value_col: str,
                        qs: list[float]) -> str:
    arr = ", ".join(repr(float(q)) for q in qs)
    ks = ", ".join(keys)
    quant = sql_round6("unnest(p)")
    return f"""
      WITH agg AS (
        SELECT {ks}, quantile_cont({value_col}, [{arr}]) AS p
        FROM {table} GROUP BY {ks})
      SELECT {ks}, unnest([{arr}]) AS q, {quant} AS quantile
      FROM agg"""


def profile_numeric(df: DataFrame, keys: list[str],
                    value_col: str) -> DataFrame:
    """Per-group numeric profile: row/null/distinct counts, min, max, and
    a DETERMINISTIC mean (summed in DECIMAL so partition order cannot
    change the result, divided back in double).

    Returns (keys..., n_rows, n_null, n_distinct, v_min, v_max, v_mean)."""
    v = F.col(value_col)
    dec_sum = F.sum(v.cast(PROFILE_DEC)).alias("_s")
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(v.isNull(), 1)).alias("n_null"),
        F.countDistinct(v).alias("n_distinct"),
        F.min(v).alias("v_min"),
        F.max(v).alias("v_max"),
        dec_sum,
        F.count(v).alias("_n"))
    mean = F.when(F.col("_n") > 0,
                  round6(F.col("_s").cast("double")
                         / F.col("_n").cast("double")))
    return agg.select(*keys, "n_rows", "n_null", "n_distinct",
                      "v_min", "v_max", mean.alias("v_mean"))


def sql_profile_numeric(table: str, keys: list[str], value_col: str) -> str:
    ks = ", ".join(keys)
    v = value_col
    mean = sql_round6(
        f"(sum({v}::DECIMAL(28,6))::DOUBLE / count({v})::DOUBLE)")
    return f"""
      SELECT {ks},
             count(*)::BIGINT AS n_rows,
             count(CASE WHEN {v} IS NULL THEN 1 END)::BIGINT AS n_null,
             count(DISTINCT {v})::BIGINT AS n_distinct,
             min({v}) AS v_min, max({v}) AS v_max,
             (CASE WHEN count({v}) > 0 THEN {mean} END) AS v_mean
      FROM {table} GROUP BY {ks}"""


def skew_report(df: DataFrame, keys: list[str], top_n: int = 20) -> DataFrame:
    """Key-skew diagnosis: the top_n heaviest key groups with row counts
    and corpus share — the report that decides salting factors and
    AQE skew thresholds before a big join/agg ships. One map-side-combining
    aggregation + TakeOrdered merge of partition heads; the total row
    count rides along via a single-row broadcast join (count-aggregate,
    not a collect).

    Returns (keys..., n_rows, share) ordered share-desc, keys-asc."""
    if top_n <= 0:
        raise ValueError("top_n must be positive")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    # The total leg is NOT folded into counts via a checkpoint (r13 A/B):
    # count(*) over a parquet relation is answered from footer row counts
    # (no data scan), so the "shared subtree" here costs ~nothing to
    # re-evaluate and the checkpoint overhead measured 0.32 -> 0.48 s at
    # sf3 — the law's cheap-subtree counter-example, like line_dedup.
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    order = [F.desc("n_rows")] + [F.asc(k) for k in keys]
    return (counts.crossJoin(F.broadcast(total))
                  .select(*keys, "n_rows",
                          round6(F.col("n_rows")
                                 / F.col("_total").cast("double"))
                          .alias("share"))
                  .orderBy(*order).limit(top_n))


def sql_skew_report(table: str, keys: list[str], top_n: int = 20) -> str:
    ks = ", ".join(keys)
    share = sql_round6(
        f"(count(*)::DOUBLE / (SELECT count(*) FROM {table})::DOUBLE)")
    order_keys = ", ".join(f"{k} ASC" for k in keys)
    return f"""
      SELECT {ks}, count(*)::BIGINT AS n_rows, {share} AS share
      FROM {table} GROUP BY {ks}
      ORDER BY n_rows DESC, {order_keys}
      LIMIT {top_n}"""


def approx_group_quantiles(df: DataFrame, keys: list[str], value_col: str,
                           qs: list[float], sample_key: str,
                           rate: float) -> DataFrame:
    """Sampled per-group quantiles: exact quantiles over the deterministic
    multiplicative-hash sample — the 100 TB path for `group_quantiles`.

    `percentile()` buffers each group's values on the reducer, so the exact
    operator's memory is O(group size); at a 25% (or 1%) sample the buffer
    shrinks proportionally while rank error concentrates at
    O(1/sqrt(group_rows * rate)) (DKW). The sample predicate is map-side
    and deterministic (`sampling.hash_sample`), so the result is a pure
    function of the data — same rows, same quantiles, any cluster, and the
    DuckDB twin reproduces it bit-for-bit."""
    from .sampling import hash_sample

    return group_quantiles(hash_sample(df, sample_key, rate), keys,
                           value_col, qs)


def sql_approx_group_quantiles(table: str, keys: list[str], value_col: str,
                               qs: list[float], sample_key: str,
                               rate: float) -> str:
    from .sampling import sql_hash_sample_where

    where = sql_hash_sample_where(sample_key, rate)
    return sql_group_quantiles(
        f"(SELECT * FROM {table} WHERE {where})", keys, value_col, qs)


def group_top_values(df: DataFrame, keys: list[str], value_col: str,
                     k: int = 5) -> DataFrame:
    """Exact per-group heavy hitters: the k most frequent values of
    `value_col` within each key group, with counts and within-group share
    (deterministic tie-break: count desc, value asc). The frequent-
    domains / frequent-tokens / frequent-labels report of a corpus audit.

    Scale shape: ONE aggregation over the raw rows (map-side combined to
    one row per (group, value)); group totals come from re-aggregating
    those combined rows, never a second scan; the rank window partitions
    by group over value-cardinality-sized input, and Spark's
    WindowGroupLimit pushes the rank<=k filter below the shuffle.

    Returns (keys..., value, n, share, rank), rank 1-based."""
    from pyspark.sql import Window
    if k <= 0:
        raise ValueError("k must be positive")
    counts = (df.groupBy(*keys, value_col)
                .agg(F.count(F.lit(1)).alias("n")))
    totals = counts.groupBy(*keys).agg(F.sum("n").alias("_gt"))
    w = (Window.partitionBy(*[F.col(c) for c in keys])
         .orderBy(F.desc("n"), F.asc(value_col)))
    return (counts.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .join(totals, keys)
                  .select(*keys, F.col(value_col).alias("value"),
                          F.col("n"),
                          round6(F.col("n") / F.col("_gt").cast("double"))
                           .alias("share"),
                          F.col("rank").cast("bigint").alias("rank")))


def sql_group_top_values(table: str, keys: list[str], value_col: str,
                         k: int = 5) -> str:
    ks = ", ".join(keys)
    share = sql_round6("(n::DOUBLE / gt::DOUBLE)")
    return f"""
      WITH c AS (SELECT {ks}, {value_col} AS value, count(*)::BIGINT AS n
                 FROM {table} GROUP BY {ks}, {value_col}),
      r AS (SELECT *, row_number() OVER (PARTITION BY {ks}
                                         ORDER BY n DESC, value ASC) AS rank,
                   sum(n) OVER (PARTITION BY {ks}) AS gt
            FROM c)
      SELECT {ks}, value, n, {share} AS share, rank::BIGINT AS rank
      FROM r WHERE rank <= {k}"""
