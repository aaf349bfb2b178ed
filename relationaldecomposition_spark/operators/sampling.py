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


def sql_hash_sample_where(key_col: str, rate: float) -> str:
    """DuckDB twin of hash_sample_pred (pmod spelled out since SQL % takes
    the dividend's sign)."""
    thresh = int(round(rate * SAMPLE_MOD))
    e = f"({key_col}::BIGINT * {SAMPLE_MULT})"
    return (f"((({e} % {SAMPLE_MOD}) + {SAMPLE_MOD}) % {SAMPLE_MOD})"
            f" < {thresh}")
