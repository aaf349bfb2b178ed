"""Deterministic sampling for 100 TB-scale profiling.

At full scale you don't mine dependencies on 100 TB directly — you profile
on a sample first (thresholds, candidate orderings, chunk planning) and
reserve full scans for the final verification pass. The sample must be:

- deterministic: the same rows on every run, every engine, every partition
  layout (so profiles are reproducible and oracle-checkable);
- pseudo-random w.r.t. the key: multiplicative hashing (Knuth's fixed-point
  scheme) decorrelates sequential ids, unlike `key % k == 0` systematic
  sampling which aliases with any periodic structure in id assignment;
- pushdown-friendly: a pure column predicate, evaluated map-side at the
  scan — no shuffle, no RNG state, no sample materialization.

The predicate is ((key * MULT) mod MOD) < rate * MOD with MULT odd, so the
map key -> bucket is a bijection on the low 16 bits: the sample rate is
exact to 1/65536 for dense key ranges. All arithmetic stays far inside
BIGINT for keys < 2^47, so DuckDB (which errors on overflow rather than
wrapping) computes the identical sample — see sql_hash_sample_where.

The plug-in entropy of a subset on the sample is a biased-low estimate of
the full-relation entropy (Miller–Madow bias ~ (m-1)/(2N ln 2) for m
distinct groups); for the profiling use-case (ranking subsets, pruning a
lattice) the ranking is what matters and the bias is shared across
subsets of similar support. The driver query a22 value-checks the sampled
pipeline bit-for-bit against DuckDB on the same sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from .materialize import local_materialize

SAMPLE_MULT = 40503          # odd multiplier ~ 2^16 / golden ratio
SAMPLE_MOD = 65536


def hash_sample_pred(key: Column, rate: float) -> Column:
    """Boolean column: deterministic pseudo-random keep-predicate at
    `rate` (exact to 1/65536). Keys may be any integral column."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thresh = int(round(rate * SAMPLE_MOD))
    return F.pmod(key.cast("long") * F.lit(SAMPLE_MULT),
                  F.lit(SAMPLE_MOD)) < F.lit(thresh)


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """The deterministic sample of `df` at `rate`, keyed on `key_col`.
    A pure filter: evaluated at the scan, never shuffles, and composes
    with any downstream operator (entropy engine, dedup, ...)."""
    return df.where(hash_sample_pred(F.col(key_col), rate))


def stratified_hash_sample(df: DataFrame, key_col: str, stratum_col: str,
                           rates: dict[str, float],
                           default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — the class-balancing /
    source-reweighting staple of training-data pipelines (downsample the
    dominant web crawl, keep all of the rare high-quality source). Each
    stratum gets its own keep-rate; rows in strata not listed use
    ``default_rate``. Still a pure map-side predicate (one CASE over the
    stratum column feeding the same multiplicative-hash threshold), so it
    composes and pushes down exactly like hash_sample."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    thresh = F.lit(int(round(default_rate * SAMPLE_MOD)))
    for s, r in sorted(rates.items()):
        thresh = F.when(F.col(stratum_col) == s,
                        F.lit(int(round(r * SAMPLE_MOD)))).otherwise(thresh)
    bucket = F.pmod(F.col(key_col).cast("long") * F.lit(SAMPLE_MULT),
                    F.lit(SAMPLE_MOD))
    return df.where(bucket < thresh)


def sql_stratified_sample_where(key_col: str, stratum_col: str,
                                rates: dict[str, float],
                                default_rate: float = 0.0) -> str:
    """DuckDB twin of stratified_hash_sample's predicate."""
    e = f"({key_col}::BIGINT * {SAMPLE_MULT})"
    bucket = f"((({e} % {SAMPLE_MOD}) + {SAMPLE_MOD}) % {SAMPLE_MOD})"
    cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {int(round(r * SAMPLE_MOD))}"
        for s, r in sorted(rates.items()))
    thresh = f"(CASE {cases} ELSE {int(round(default_rate * SAMPLE_MOD))} END)"
    return f"{bucket} < {thresh}"


def sql_hash_sample_where(key_col: str, rate: float) -> str:
    """DuckDB twin of hash_sample_pred (pmod spelled out since SQL % takes
    the dividend's sign)."""
    thresh = int(round(rate * SAMPLE_MOD))
    e = f"({key_col}::BIGINT * {SAMPLE_MULT})"
    return (f"((({e} % {SAMPLE_MOD}) + {SAMPLE_MOD}) % {SAMPLE_MOD})"
            f" < {thresh}")


# -- weighted top-k sampling (Efraimidis-Spirakis) ---------------------------

# Larger modulus than the rate-sampler: the uniform feeds a log, so we want
# fine granularity; +0.5 keeps u strictly inside (0,1).
WS_MULT = 1327217           # odd, ~ 2^21 / golden ratio
WS_MOD = 2097152            # 2^21


def weighted_sample_topk(df: DataFrame, key_col: str, weight_col,
                         k: int) -> DataFrame:
    """Weighted random sample WITHOUT replacement of size k — the
    Efraimidis-Spirakis A-ES scheme with deterministic hash randomness:
    each row gets u = hash(key) mapped into (0,1) and score ln(u)/w
    (monotone twin of u^(1/w)); the k largest scores are the sample, so a
    row's inclusion probability is proportional to its weight, and the
    same rows are chosen on every run and every engine.

    Rows with NULL or non-positive weight are excluded (they cannot carry
    probability mass).

    Scale: Spark plans orderBy+limit as TakeOrderedAndProject — a per-
    partition top-k then a driver-side merge of partition heads, NEVER a
    single-partition global-sort window (pinned in tests). k rows cross
    the wire per partition; nothing else moves.

    Returns the selected rows as (key, weight, samp_score desc)."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    wname = weight_col if isinstance(weight_col, str) else "weight"
    u = (F.pmod(F.col(key_col).cast("long") * F.lit(WS_MULT), F.lit(WS_MOD))
         .cast("double") + F.lit(0.5)) / F.lit(float(WS_MOD))
    score = F.log(u) / w.cast("double")
    from .text import round6
    out = (df.where(w.isNotNull() & (w > 0))
             .select(F.col(key_col), w.cast("double").alias(wname),
                     score.alias("_raw_score"))
             .orderBy(F.desc("_raw_score"), F.asc(key_col))
             .limit(k)
             # round6 is the same floor formula on both engines; for the
             # negative scores here that's half-toward-+inf on BOTH sides,
             # which is all parity needs
             .select(F.col(key_col), wname,
                     round6(F.col("_raw_score")).alias("samp_score")))
    return out


def sql_weighted_sample_topk(table: str, key_col: str, weight_expr: str,
                             k: int, weight_name: str = "weight") -> str:
    """DuckDB twin: identical u construction, identical score, identical
    (score DESC, key ASC) order + LIMIT."""
    from .text import sql_round6
    e = f"({key_col}::BIGINT * {WS_MULT})"
    u = (f"((((({e} % {WS_MOD}) + {WS_MOD}) % {WS_MOD})::DOUBLE + 0.5)"
         f" / {float(WS_MOD)})")
    score = f"(ln({u}) / ({weight_expr})::DOUBLE)"
    rounded = sql_round6(score)
    return f"""
      SELECT {key_col}, ({weight_expr})::DOUBLE AS {weight_name},
             {rounded} AS samp_score
      FROM {table}
      WHERE ({weight_expr}) IS NOT NULL AND ({weight_expr}) > 0
      ORDER BY {score} DESC, {key_col} ASC
      LIMIT {k}"""


# -- mixture rebalancing ------------------------------------------------------

def rebalance_to_mixture(df: DataFrame, key_col: str, stratum_col: str,
                         targets: dict[str, float]) -> DataFrame:
    """Downsample strata so the surviving rows match a target mixture — the
    "rebalance the pretraining corpus to 50% web / 30% code / 20% books"
    step. Keeps as many rows as possible: the achievable total is
    cap = min over targeted strata of (count_s / p_s), and each stratum is
    hash-sampled at rate cap * p_s / count_s with the same deterministic
    multiplicative hash as hash_sample (thresholds quantized to
    1/65536). Strata not in `targets` are dropped.

    Fully declarative — counts are an aggregate joined back by broadcast
    (one row per stratum), the filter is a map-side predicate; nothing is
    collected to the driver, so the same plan runs at 100 TB. Sampling is
    by hash threshold, so per-stratum output counts are exact to the
    threshold quantization (not exact-n; use weighted_sample_topk when an
    exact count matters more than a scan-shaped plan)."""
    if not targets:
        raise ValueError("targets must be non-empty")
    for s, w in targets.items():
        if w <= 0:
            raise ValueError(f"target share for {s!r} must be > 0")
    tot = sum(targets.values())
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"target shares must sum to 1, got {tot}")
    p_expr = None
    for s, w in sorted(targets.items()):
        p_expr = (F.when(F.col(stratum_col) == s, F.lit(float(w)))
                  if p_expr is None else
                  p_expr.when(F.col(stratum_col) == s, F.lit(float(w))))
    counts = (df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
              .withColumn("_p", p_expr)
              .where(F.col("_p").isNotNull()))
    if not df.isStreaming:
        # counts feeds the cap aggregate AND the threshold frame — each
        # consumption re-scanned the corpus for the groupBy (shared-
        # subtree law); the frame is strata-sized, internal, and the
        # operator's output join still reads `df` directly (caller
        # pushdown unaffected). Fault-tolerance knob:
        # operators/materialize.py (ADVICE r13).
        counts = local_materialize(counts, eager=False)
    cap = counts.agg(F.min(F.col("_n") / F.col("_p")).alias("_cap"))
    th = (counts.crossJoin(F.broadcast(cap))
          .select(F.col(stratum_col),
                  F.floor(F.col("_cap") * F.col("_p") / F.col("_n")
                          * F.lit(float(SAMPLE_MOD)))
                   .cast("long").alias("_thresh")))
    bucket = F.pmod(F.col(key_col).cast("long") * F.lit(SAMPLE_MULT),
                    F.lit(SAMPLE_MOD))
    return (df.join(F.broadcast(th), stratum_col)
              .where(bucket < F.col("_thresh"))
              .drop("_thresh"))


def temperature_mixture(df: DataFrame, key_col: str, stratum_col: str,
                        alpha: float = 0.7) -> DataFrame:
    """Temperature-based mixture resampling: downsample strata so the
    surviving shares follow p_i ∝ n_i^alpha — the standard multilingual /
    multi-domain corpus reweighting (exponentiated smoothing; alpha < 1
    upweights rare strata relative to their natural share, alpha = 1 is a
    no-op, alpha = 0 equalizes). The TARGETS come from the data itself —
    `rebalance_to_mixture` with data-derived shares — and the whole
    derivation stays one declarative plan: per-stratum counts (one
    map-side-combining agg), weights w_i = round6(n_i^alpha) (rounded so
    the DuckDB twin's libm pow agrees bit-for-bit after quantization),
    achievable cap = min(n_i * W / w_i), per-stratum hash thresholds
    quantized to 1/65536, broadcast back, map-side filter. Nothing is
    collected; the same plan runs at 100 TB."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    from .text import round6

    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    if not df.isStreaming:
        # counts reaches the output through FOUR paths (w -> tot, j, cap,
        # th) — each re-scanned the corpus (shared-subtree law); the
        # strata-sized checkpoint makes the whole derivation one scan.
        # Fault-tolerance knob: operators/materialize.py (ADVICE r13).
        counts = local_materialize(counts, eager=False)
    w = counts.withColumn(
        "_w", round6(F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))))
    tot = w.agg(F.sum("_w").alias("_tw"))
    # cap = min over strata of n_i / p_i = min(n_i * W / w_i); threshold
    # arithmetic in the same operation order as the DuckDB twin
    j = w.crossJoin(F.broadcast(tot))
    cap = j.agg(F.min(F.col("_n") * F.col("_tw") / F.col("_w"))
                .alias("_cap"))
    th = (j.crossJoin(F.broadcast(cap))
          .select(F.col(stratum_col),
                  F.floor(F.col("_cap") * (F.col("_w") / F.col("_tw"))
                          / F.col("_n") * F.lit(float(SAMPLE_MOD)))
                   .cast("long").alias("_thresh")))
    bucket = F.pmod(F.col(key_col).cast("long") * F.lit(SAMPLE_MULT),
                    F.lit(SAMPLE_MOD))
    return (df.join(F.broadcast(th), stratum_col)
              .where(bucket < F.col("_thresh"))
              .drop("_thresh"))


def sql_temperature_mixture(table: str, key_col: str, stratum_col: str,
                            alpha: float, select_cols: str) -> str:
    """DuckDB twin of temperature_mixture — identical weight rounding,
    cap/threshold arithmetic and hash predicate."""
    from .text import sql_round6
    e = f"(d.{key_col}::BIGINT * {SAMPLE_MULT})"
    bucket = f"((({e} % {SAMPLE_MOD}) + {SAMPLE_MOD}) % {SAMPLE_MOD})"
    w6 = sql_round6(f"pow(n::DOUBLE, {float(alpha)!r})")
    return f"""
      WITH cnt AS (SELECT {stratum_col} AS stratum, count(*)::BIGINT AS n
                   FROM {table} GROUP BY 1),
      w AS (SELECT stratum, n, {w6} AS w FROM cnt),
      tot AS (SELECT sum(w) AS tw FROM w),
      cap AS (SELECT min(n * (SELECT tw FROM tot) / w) AS c FROM w),
      th AS (SELECT stratum,
                    floor((SELECT c FROM cap)
                          * (w / (SELECT tw FROM tot)) / n
                          * {SAMPLE_MOD})::BIGINT AS thresh
             FROM w)
      SELECT {select_cols}
      FROM {table} d JOIN th ON d.{stratum_col} = th.stratum
      WHERE {bucket} < th.thresh"""


def sql_rebalance_to_mixture(table: str, key_col: str, stratum_col: str,
                             targets: dict[str, float],
                             select_cols: str) -> str:
    """DuckDB twin of rebalance_to_mixture: identical cap/threshold
    arithmetic (same operation order, so the IEEE doubles agree), identical
    hash predicate."""
    vals = ", ".join(f"('{s}', {float(w)!r})"
                     for s, w in sorted(targets.items()))
    e = f"(d.{key_col}::BIGINT * {SAMPLE_MULT})"
    bucket = f"((({e} % {SAMPLE_MOD}) + {SAMPLE_MOD}) % {SAMPLE_MOD})"
    return f"""
      WITH tgt(stratum, p) AS (VALUES {vals}),
      cnt AS (SELECT {stratum_col} AS stratum, count(*)::BIGINT AS n
              FROM {table} GROUP BY 1),
      j AS (SELECT t.stratum, t.p, c.n FROM tgt t JOIN cnt c USING (stratum)),
      cap AS (SELECT min(n / p) AS c FROM j),
      th AS (SELECT stratum,
                    floor((SELECT c FROM cap) * p / n * {SAMPLE_MOD})::BIGINT
                      AS thresh
             FROM j)
      SELECT {select_cols}
      FROM {table} d JOIN th ON d.{stratum_col} = th.stratum
      WHERE {bucket} < th.thresh"""


# ---------------------------------------------------------------------------
# deterministic global shuffle + sharding (training-data writer prepass)
# ---------------------------------------------------------------------------

def shard_shuffle(df: DataFrame, key_col: str, n_shards: int,
                  seed: int = 42) -> DataFrame:
    """Deterministic global corpus shuffle for training-data writes: every
    row gets a pseudo-random but reproducible rank (seeded affine permute
    of the portable 60-bit key hash), a shard = rank mod n_shards, and its
    0-based position within the shard ordered by (rank, key). The standard
    "shuffle the corpus before sharding to epochs" step, as a pure
    DataFrame op.

    Scale shape (100 TB): the hash/shard columns are map-only; the only
    shuffle is the per-shard window (ONE exchange on shard, each shard
    sorts its own ~n/n_shards slice — exactly the work a shard writer has
    to do anyway). Size n_shards so a shard fits an executor's sort
    budget; the downstream write is `.repartition("shard")` +
    `partitionBy("shard")` with rows already in position order.
    Determinism: same seed → same permutation on any cluster layout; ties
    in rank (hash collisions) break by key, so the order is total.

    Returns (key, shard, pos) with shard in [0, n_shards), pos dense per
    shard. DuckDB twin: sql_shard_shuffle (identical md5-affine
    arithmetic, bit-identical assignment)."""
    from ..functions.hashing import (affine_hash, minhash_params,
                                     portable_hash32)
    from pyspark.sql import Window

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    a, b = minhash_params(1, seed)[0]
    rank = affine_hash(portable_hash32(F.col(key_col).cast("string")), a, b)
    w = (Window.partitionBy("shard")
         .orderBy(F.col("_rank").asc(), F.col(key_col).asc()))
    return (df.select(F.col(key_col), rank.alias("_rank"))
            .withColumn("shard", F.pmod(F.col("_rank"),
                                        F.lit(n_shards)).cast("int"))
            .withColumn("pos", F.row_number().over(w).cast("long") - 1)
            .select(key_col, "shard", "pos"))


def sql_shard_shuffle(table: str, key_col: str, n_shards: int,
                      seed: int = 42) -> str:
    """DuckDB twin of shard_shuffle: same md5-derived hash, same seeded
    affine permute, same (rank, key) window order."""
    from ..functions.hashing import (MERSENNE_P, minhash_params, sql_hash32)

    a, b = minhash_params(1, seed)[0]
    h = sql_hash32(f"CAST({key_col} AS VARCHAR)")
    rank = f"(({h} * {a} + {b}) % {MERSENNE_P})"
    return f"""
      SELECT {key_col},
             (((({rank}) % {n_shards}) + {n_shards}) % {n_shards})::INT
               AS shard,
             (row_number() OVER (
                PARTITION BY ((({rank}) % {n_shards}) + {n_shards})
                             % {n_shards}
                ORDER BY {rank} ASC, {key_col} ASC) - 1)::BIGINT AS pos
      FROM {table}"""
