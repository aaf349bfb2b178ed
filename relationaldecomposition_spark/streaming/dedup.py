"""Streaming deduplication — the streaming twin of operators/dedup.py.

- ``dedup_stream``: exact dedup on key columns within a watermark horizon
  (dropDuplicatesWithinWatermark): state is bounded by the horizon, late
  duplicates beyond it are NOT caught — the standard at-scale tradeoff.
- ``fingerprint_dedup_stream``: near-dup-ready variant — dedup on a content
  fingerprint column (computed with the same portable hashing as the batch
  operators) instead of raw keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import portable_hash64
from .events import with_watermark


def dedup_stream(stream: DataFrame, keys: list[str], ts_col: str = "ts",
                 watermark: str = "10 minutes") -> DataFrame:
    """Drop duplicate events (same key columns) arriving within the
    watermark horizon of each other."""
    return (with_watermark(stream, ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def fingerprint_dedup_stream(stream: DataFrame, content_col: str,
                             ts_col: str = "ts",
                             watermark: str = "10 minutes") -> DataFrame:
    """Content-hash dedup: identical payloads within the horizon collapse to
    their first arrival."""
    withfp = stream.withColumn(
        "__fp", portable_hash64(F.col(content_col)))
    return (with_watermark(withfp, ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__fp"])
            .drop("__fp"))
