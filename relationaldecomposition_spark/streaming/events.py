"""Streaming operators over the `events` table shape
(event_id, ts, user_id, event_type, value, props).

The reference has no streaming plane (SURVEY.md §2 coverage table) — this
module is part of the beyond-reference pipeline surface. Design rule:
transformations are written once and applied to BOTH batch DataFrames and
Structured Streaming DataFrames (unbounded). Batch twins power the DuckDB
oracle gate; the pytest suite runs the same transformations through
readStream -> writeStream(memory) and asserts batch/stream agreement.

Scale notes:
- windowed_counts is a streaming aggregation with a watermark: state is
  bounded by (watermark horizon x #groups); late events beyond the
  watermark are dropped, exactly-once via checkpointing.
- sessionize uses session_window (native state merging) rather than a
  global sort; per-user gap sessions shuffle only on user_id.
- running_user_stats is the custom-stateful example: per-user running
  aggregates via applyInPandasWithState with explicit GroupState, the
  escape hatch for semantics window functions can't express on streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

DEFAULT_WINDOW = "1 hour"
DEFAULT_GAP = "30 minutes"
DEFAULT_WATERMARK = "10 minutes"


def with_watermark(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """withWatermark that tolerates TIMESTAMP_NTZ event time. Parquet naive
    timestamps (the testdata's `ts`) read as NTZ, which watermarks reject
    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]); with the session timezone
    pinned to UTC the cast to TIMESTAMP is value-preserving. Only the
    watermark (streaming) path casts — batch twins keep the source type so
    oracle comparisons see unchanged values."""
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def windowed_counts(events: DataFrame, window: str = DEFAULT_WINDOW,
                    watermark: str | None = None) -> DataFrame:
    """Tumbling-window counts + value sum per event_type. Watermark only
    applies to streaming inputs (bounds state; drops late data)."""
    src = with_watermark(events, "ts", watermark) if watermark else events
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def sql_windowed_counts(table: str) -> str:
    return (
        "SELECT date_trunc('hour', ts) AS window_start, event_type, "
        "count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value "
        f"FROM {table} GROUP BY 1, 2")


def sessionize(events: DataFrame, gap: str = DEFAULT_GAP,
               watermark: str | None = None) -> DataFrame:
    """Gap-based sessions per user via native session_window (state-merging
    on streams, no global sort on batch)."""
    src = with_watermark(events, "ts", watermark) if watermark else events
    return (src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select("user_id", F.col("sw.start").alias("session_start"),
                    "n_events", "sum_value"))


def sql_sessionize(table: str, gap_minutes: int = 30) -> str:
    """Gaps-and-islands twin of session_window for the oracle."""
    return f"""
      WITH ordered AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM {table}),
      flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL {gap_minutes} MINUTE
                    THEN 1 ELSE 0 END AS new_session
               -- strict >: verified empirically against session_window —
               -- Spark MERGES events exactly gap-distance apart
               -- (tests/test_streaming.py::test_exact_gap_boundary)
        FROM ordered),
      sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged)
      SELECT user_id, min(ts) AS session_start, count(*)::BIGINT AS n_events,
             round(sum(value), 6) AS sum_value
      FROM sessions GROUP BY user_id, session_id"""


def batch_user_stats(events: DataFrame) -> DataFrame:
    """Batch twin of ``running_user_stats``' CONVERGED state: once a stream
    drains, the last update emitted per user equals exactly this aggregate
    (pinned by tests/test_streaming.py stream==batch assertion). This is
    the oracle-gateable face of the stateful op — the running updates
    themselves are streams-only semantics."""
    return (events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value")))


def sql_user_stats(table: str) -> str:
    return (f"SELECT user_id, count(*)::BIGINT AS n_events, "
            f"round(sum(value), 6) AS total_value FROM {table} "
            f"GROUP BY user_id")


# ---------------------------------------------------------------------------
# stream-static enrichment join
# ---------------------------------------------------------------------------

# event_type dimension: (type, category, weight). A stand-in for the small
# reference/dimension tables a pipeline joins against (user registries,
# source metadata, label maps). Literal rows so the DuckDB oracle embeds
# the identical dimension as a VALUES list.
EVENT_TYPE_DIM: list[tuple[str, str, float]] = [
    ("click", "engagement", 1.0),
    ("view", "engagement", 0.5),
    ("purchase", "conversion", 10.0),
    ("signup", "conversion", 5.0),
    ("error", "ops", 0.0),
]


def event_type_dim(spark) -> DataFrame:
    return spark.createDataFrame(
        EVENT_TYPE_DIM, "event_type string, category string, weight double")


def enrich_events(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast join: annotate each event with its dimension
    row and a weighted value. Works identically on batch and streaming
    inputs (stream-static equi-joins are stateless in Structured
    Streaming — each micro-batch joins against the static side; broadcast
    keeps it map-side, no stream-side shuffle). Left join: unknown types
    survive with NULL category."""
    return (events.join(F.broadcast(dim), "event_type", "left")
            .withColumn("weighted_value", F.col("value") * F.col("weight")))


def enriched_category_totals(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Enrichment + rollup to (event_type, category): the gate-facing
    aggregate (count, summed weighted value) whose values pin the join."""
    return (enrich_events(events, dim)
            .groupBy("event_type", "category")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("weighted_value"), 6).alias("sum_weighted")))


def sql_enriched_category_totals(table: str) -> str:
    dim_rows = ", ".join(f"('{t}', '{c}', {w})" for t, c, w in EVENT_TYPE_DIM)
    return f"""
      WITH dim(event_type, category, weight) AS (VALUES {dim_rows})
      SELECT e.event_type, d.category, count(*)::BIGINT AS n_events,
             round(sum(e.value * d.weight), 6) AS sum_weighted
      FROM {table} e LEFT JOIN dim d ON e.event_type = d.event_type
      GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

RUNNING_STATS_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in GroupState —
    emits the updated running totals once per micro-batch per active user.
    The custom-stateful-op pattern for semantics windows can't express
    (cross-batch monotone state on an unbounded stream)."""
    import pandas as pd

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (stream.groupBy("user_id").applyInPandasWithState(
        update, outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA, outputMode="update",
        timeoutConf="NoTimeout"))
