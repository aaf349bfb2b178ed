"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns + a typed metadata struct. The Spark
plumbing — schema, Arrow batching via mapInPandas, partition-size control —
is real and tested; the actual codec work is STUBBED (this container has no
image/audio libraries) behind ``Decoder`` implementations:

- ``FakeDecoder``   deterministic features from the raw bytes (used in tests
                    and oracles — byte length, fake width/height)
- ``PillowDecoder`` real image decode, raises NotImplementedError unless
                    Pillow is importable (import-gated, never at module load)

Scale notes: mapInPandas streams Arrow batches — media bytes never
materialize as Python lists; `spark.sql.files.maxPartitionBytes` and
`maxRecordsPerBatch` bound executor memory per batch. Feature extraction is
embarrassingly parallel: no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("media_type", T.StringType(), True),   # image|audio|video
    T.StructField("meta", T.StructType([
        T.StructField("source", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


class Decoder:
    """Codec boundary. decode_batch gets/returns pandas — one Arrow batch."""

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        raise NotImplementedError


class FakeDecoder(Decoder):
    """Deterministic stand-in: features are pure functions of the bytes, so
    oracles can recompute them in SQL (width = n_bytes % 640, etc.)."""

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        n = content.map(lambda b: len(b) if b is not None else 0)
        return pd.DataFrame({
            "n_bytes": n.astype("int64"),
            "width": (n % 640).astype("int32"),
            "height": ((n * 7) % 480).astype("int32"),
        })


class PillowDecoder(Decoder):
    """Real image decoding — STUB: requires Pillow, which this environment
    does not ship. Import-gated so the module always loads."""

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "PillowDecoder needs Pillow; install it or use FakeDecoder"
            ) from e
        raise NotImplementedError("real decode path not implemented in this container")


def documents_as_media(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload —
    exercises the full binary-column path on the driver-provided tables."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.struct(F.lit("documents").alias("source"),
                 F.octet_length(F.encode(F.col(text_col), "UTF-8"))
                  .cast("long").alias("n_bytes")).alias("meta"),
    )


def extract_features(media: DataFrame, decoder: Decoder | None = None,
                     batch_size: int = 256) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched)."""
    decoder = decoder or FakeDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size]
                feats = decoder.decode_batch(chunk["content"])
                feats.insert(0, "media_id", chunk["media_id"].values)
                yield feats

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing demo: emit one row per sampled offset of
    each payload (video-frame analogue) — pure column ops, no UDF."""
    n = F.octet_length("content")
    offsets = F.sequence(F.lit(0), F.greatest((n - 1), F.lit(0)),
                         F.lit(every_n_bytes))
    return media.select("media_id",
                        F.explode(offsets).alias("frame_offset"),
                        F.substring(F.col("content").cast("string"), 1, 8)
                         .alias("frame_preview"))
