"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (BASELINE.json north star).

The Spark-side machinery (schemas, batch iteration, partition sizing) is
real and tested; the codec work itself is STUBBED — image/audio libraries
are not in this container, so ``decode_images``/``sample_frames`` run a
deterministic fake decoder behind the same ``mapInPandas`` plumbing a real
Pillow/ffmpeg implementation would use (swap ``_fake_decode`` for the real
codec; the Spark contract does not change).

Design for 100 TB of media:
- binary payloads ride in their own column so column pruning keeps metadata
  queries from touching bytes at all;
- decode runs in ``mapInPandas`` (Arrow batches, one Python worker per
  partition); ``media_repartition_by_bytes`` sizes partitions by payload
  bytes, not row count, so a partition of 4K-thumbnails and a partition of
  4K-video chunks cost similar memory;
- features come back as fixed-length float arrays ready for the similarity
  operators (datapipe/similarity.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

DECODED_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, ok boolean, "
    "feature array<float>"
)


def _fake_decode(payload: bytes | None, dim: int = 8) -> list[float] | None:
    """Deterministic stand-in for a codec+featurizer: a byte-histogram
    projection. REPLACE with the real decoder; same signature."""
    if payload is None:
        return None
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload), 1)
    return [float(a) / n for a in acc]


def decode_media(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Binary payloads → features via Arrow-batched mapInPandas (the real
    codec slots into ``_fake_decode``)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: _fake_decode(p, feature_dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "ok": feats.notna(),
                    "feature": feats,
                }
            )

    return df.mapInPandas(op, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling STUB: emits (media_id, frame_ts_ms) rows for
    videos from metadata only — the actual frame extraction would decode
    ``payload`` inside the same mapInPandas pattern as ``decode_media``."""
    vids = df.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def media_repartition_by_bytes(df: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Partition by cumulative payload size rather than row count: assign a
    byte-bucketed salt key and repartition on it. At 100 TB this is what
    keeps a decode stage's memory bounded."""
    with_size = df.withColumn(
        "__bytes", F.coalesce(F.length("payload").cast("long"), F.lit(0))
    )
    # deterministic salt: media_id spread × size class
    size_class = F.floor(F.log2(F.col("__bytes") + 2)).cast("int")
    n = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    salt = F.pmod(F.xxhash64("media_id"), F.lit(n)).cast("int")
    return (
        with_size.repartition(n, size_class, salt).drop("__bytes")
    )
