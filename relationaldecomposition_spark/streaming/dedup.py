"""Streaming deduplication — the streaming twin of operators/dedup.py.

- ``dedup_stream``: exact dedup on key columns within a watermark horizon
  (dropDuplicatesWithinWatermark): state is bounded by the horizon, late
  duplicates beyond it are NOT caught — the standard at-scale tradeoff.
- ``fingerprint_dedup_stream``: near-dup-ready variant — dedup on a content
  fingerprint column (computed with the same portable hashing as the batch
  operators) instead of raw keys.
- ``band_ingest_stream`` / ``seed_band_store``: the full continuous-
  ingestion LOOP over a persisted minhash band-index store — per
  micro-batch: probe (incremental_dedup), append the survivors' band
  rows, so the NEXT batch sees them. Completes the streaming dedup story
  that ``index_collision_stream`` (flag-only, static index) starts.
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


# ---------------------------------------------------------------------------
# continuous band-index ingestion (r14 verdict ask #6)
# ---------------------------------------------------------------------------

INGEST_BATCH_COL = "_ingest_batch"


def seed_band_store(index: DataFrame, store_path: str) -> None:
    """Write an initial corpus band index (`minhash_band_index` output)
    as the seed of a continuous-ingest store. The store is ALWAYS
    partitioned by the ingest-batch column (seed rows carry -1) so that
    later micro-batch appends are idempotent partition overwrites."""
    (index.withColumn(INGEST_BATCH_COL, F.lit(-1))
          .write.mode("overwrite").partitionBy(INGEST_BATCH_COL)
          .parquet(store_path))


def read_band_store(spark, store_path: str) -> DataFrame:
    """The current (band, sig, id...) index rows of a band store —
    the probe face of the persisted loop state."""
    return spark.read.parquet(store_path).drop(INGEST_BATCH_COL)


def band_ingest_stream(stream: DataFrame, store_path: str, text_col: str,
                       id_col: str, *, n_hashes: int | None = None,
                       bands: int | None = None,
                       shingle_k: int | None = None, seed: int = 42,
                       stats_path: str | None = None):
    """foreachBatch driver for the continuous-ingestion loop: per
    micro-batch, probe the batch against the PERSISTED band-index store
    (`dedup.incremental_dedup` — broadcast-pruned, the index is scanned
    map-only and never shuffled), then append the SURVIVORS' band rows,
    so the next micro-batch deduplicates against everything admitted so
    far. Per-doc probe stats optionally land under ``stats_path``.

    Returns a ``DataStreamWriter`` — attach a checkpointLocation and
    ``.start()`` it. Batch twin: each invocation runs EXACTLY the
    `dedup.ingest_batch` plan against the store (pinned batch == stream
    in tests/test_bucketed_and_stream_dedup.py), so the registry gate
    o79 verifies the same chain end-to-end against DuckDB.

    Scale/replay contract:
    - Both output frames are materialized (eager localCheckpoint,
      batch-sized) BEFORE the store is touched: their plans READ the
      store, and appending to a path a lazy plan still has to scan is a
      correctness hazard.
    - Writes are dynamic partition overwrites keyed by the micro-batch
      id: a failed-and-replayed batch overwrites ITS OWN partition
      instead of appending duplicate rows — idempotent exactly-once
      store state on top of foreachBatch's at-least-once contract.
    - The store is never globally rewritten: each ingest touches one
      new partition (plus the probe's map-only scan), so ingest cost
      stays batch-sized regardless of corpus size."""
    kw = {}
    if n_hashes is not None:
        kw["n_hashes"] = n_hashes
    if bands is not None:
        kw["bands"] = bands
    if shingle_k is not None:
        kw["shingle_k"] = shingle_k

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_one_batch(batch_df, int(batch_id), store_path, text_col,
                         id_col, seed=seed, stats_path=stats_path, **kw)

    return (stream.writeStream.outputMode("update")
            .foreachBatch(_one_batch))


def ingest_one_batch(batch_df: DataFrame, batch_id: int, store_path: str,
                     text_col: str, id_col: str, *, seed: int = 42,
                     stats_path: str | None = None, **kw) -> None:
    """One ingest step of the loop (the body band_ingest_stream runs per
    micro-batch) — exposed so batch pipelines can drive the same store
    without a streaming query, and so replay idempotence is directly
    testable: re-running a (batch_df, batch_id) pair overwrites its own
    partition and leaves the store state identical."""
    from ..operators import dedup as _dedup

    spark = batch_df.sparkSession
    index = read_band_store(spark, store_path)
    stats, new_rows = _dedup.ingest_batch(batch_df, index, text_col,
                                          id_col, seed=seed, **kw)
    new_rows = new_rows.localCheckpoint(eager=True)
    if stats_path is not None:
        stats = stats.localCheckpoint(eager=True)
    (new_rows.withColumn(INGEST_BATCH_COL, F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(INGEST_BATCH_COL).parquet(store_path))
    if stats_path is not None:
        (stats.withColumn(INGEST_BATCH_COL, F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(INGEST_BATCH_COL).parquet(stats_path))
