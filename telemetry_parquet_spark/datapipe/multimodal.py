"""Multimodal columns: image/audio/video as opaque binary columns with typed
metadata (BASELINE.json north star).

The codecs are REAL pure-Python parsers (``struct`` only — the container has
no Pillow/ffmpeg, and none are needed for these formats):

- **WAV/PCM** (RIFF chunk walk): sample rate, bit depth, channel count, and
  the decoded sample values come from the actual header + data chunk.
- **BMP** (BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bpp): width/height from
  the header, pixel content from the (row-padded) pixel array.
- **TPSV** (a deterministic toy video container: magic + frame directory +
  fixed-size frames): per-frame extraction for ``sample_frames``.

``decode_media`` sniffs the magic bytes — it does NOT trust the ``kind``
column — and returns ok=False (nulls elsewhere) for truncated or foreign
payloads instead of raising, so one corrupt blob cannot fail a 100 TB scan.

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

import struct
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
    "format string, width int, height int, sample_rate int, n_samples bigint, "
    "n_frames int, duration_ms bigint, content_sum bigint, feature array<float>"
)

TPSV_MAGIC = b"TPSV"
TPSV_FRAME_BYTES = 16
TPSV_FRAME_MS = 40  # 25 fps


# ---------------------------------------------------------------------------
# Encoders (test/synthesis side — deterministic, byte-exact)
# ---------------------------------------------------------------------------


def encode_wav(data: bytes, sample_rate: int = 8000) -> bytes:
    """8-bit mono PCM WAV: 44-byte RIFF header + ``data`` as raw samples."""
    n = len(data)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate, 1, 8)
        + b"data"
        + struct.pack("<I", n)
        + data
    )


def encode_bmp(data: bytes, width: int = 16) -> bytes:
    """24-bpp BMP whose pixels are gray levels of ``data`` bytes, row-major
    top-down (negative height), zero-padded to fill the last row. Row stride
    is width*3 padded to a 4-byte boundary per the BMP spec."""
    height = max((len(data) + width - 1) // width, 1)
    padded = data + b"\x00" * (width * height - len(data))
    stride = (width * 3 + 3) & ~3
    rowpad = b"\x00" * (stride - width * 3)
    pixels = b"".join(
        b"".join(bytes([b, b, b]) for b in padded[r * width : (r + 1) * width])
        + rowpad
        for r in range(height)
    )
    header_size = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_size + len(pixels), 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, width, -height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
        + pixels
    )


def encode_tpsv(data: bytes) -> bytes:
    """Toy video container: magic, frame count, frame size, data length, then
    fixed-size frames (data zero-padded to a whole number of frames)."""
    n_frames = max((len(data) + TPSV_FRAME_BYTES - 1) // TPSV_FRAME_BYTES, 1)
    padded = data + b"\x00" * (n_frames * TPSV_FRAME_BYTES - len(data))
    return (
        TPSV_MAGIC
        + struct.pack("<III", n_frames, TPSV_FRAME_BYTES, len(data))
        + padded
    )


# ---------------------------------------------------------------------------
# Decoders (engine side — sniff magic, parse, never raise)
# ---------------------------------------------------------------------------


def _decode_wav(p: bytes) -> dict | None:
    """RIFF chunk walk; returns None unless a valid fmt + data chunk pair is
    found. Supports the PCM subset (what the encoder writes)."""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos, fmt, samples = 12, None, None
    while pos + 8 <= len(p):
        cid, size = p[pos : pos + 4], struct.unpack("<I", p[pos + 4 : pos + 8])[0]
        body = p[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None  # truncated chunk
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size & 1)
    if fmt is None or samples is None or fmt[0] != 1 or fmt[5] != 8 or fmt[1] != 1:
        return None
    rate = fmt[2]
    n = len(samples)
    return {
        "format": "wav",
        "sample_rate": rate,
        "n_samples": n,
        "duration_ms": n * 1000 // max(rate, 1),
        "content_sum": sum(samples),
        "content": samples,
    }


def _decode_bmp(p: bytes) -> dict | None:
    """BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bpp uncompressed; sums the
    gray level (R channel) of every pixel, skipping row padding."""
    if len(p) < 54 or p[:2] != b"BM":
        return None
    data_offset = struct.unpack("<I", p[10:14])[0]
    hdr_size, width, height, _planes, bpp = struct.unpack("<IiiHH", p[14:30])
    compression = struct.unpack("<I", p[30:34])[0]
    if hdr_size < 40 or bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if len(p) < data_offset + stride * height:
        return None  # truncated pixel array
    rows = range(height) if top_down else range(height - 1, -1, -1)
    content = bytearray()
    for r in rows:
        row = p[data_offset + r * stride : data_offset + r * stride + width * 3]
        content += row[2::3]  # R channel (BGR order), gray so any channel works
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "content_sum": sum(content),
        "content": bytes(content),
    }


def _decode_tpsv(p: bytes) -> dict | None:
    if len(p) < 16 or p[:4] != TPSV_MAGIC:
        return None
    n_frames, frame_size, data_len = struct.unpack("<III", p[4:16])
    body = p[16:]
    if len(body) < n_frames * frame_size or data_len > n_frames * frame_size:
        return None  # truncated
    data = body[:data_len]
    return {
        "format": "tpsv",
        "n_frames": n_frames,
        "duration_ms": n_frames * TPSV_FRAME_MS,
        "content_sum": sum(data),
        "content": data,
        "frames": [
            body[i * frame_size : (i + 1) * frame_size] for i in range(n_frames)
        ],
    }


def decode_payload(payload: bytes | None) -> dict | None:
    """Magic-byte dispatch to the right parser; None for null/foreign/corrupt
    payloads (a 100 TB decode stage must skip, not throw)."""
    if payload is None:
        return None
    for dec in (_decode_wav, _decode_bmp, _decode_tpsv):
        try:
            out = dec(payload)
        except (struct.error, IndexError, ValueError):
            out = None
        if out is not None:
            return out
    return None


def _feature_histogram(content: bytes, dim: int = 8) -> list[float]:
    """Fixed-length feature from decoded content: mean byte value per
    ``dim``-stripe — ready for the similarity operators."""
    acc = [0] * dim
    for i, b in enumerate(content):
        acc[i % dim] += b
    n = max(len(content), 1)
    return [float(a) / n for a in acc]


def decode_media(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Binary payloads → parsed metadata + content features via Arrow-batched
    ``mapInPandas``. Corrupt/unknown payloads yield ok=False rows."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "kind", "n_bytes", "ok", "format", "width",
                "height", "sample_rate", "n_samples", "n_frames",
                "duration_ms", "content_sum", "feature",
            )}
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                d = decode_payload(p)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(p) if p is not None else 0)
                out["ok"].append(d is not None)
                out["format"].append(d.get("format") if d else None)
                out["width"].append(d.get("width") if d else None)
                out["height"].append(d.get("height") if d else None)
                out["sample_rate"].append(d.get("sample_rate") if d else None)
                out["n_samples"].append(d.get("n_samples") if d else None)
                out["n_frames"].append(d.get("n_frames") if d else None)
                out["duration_ms"].append(d.get("duration_ms") if d else None)
                out["content_sum"].append(d.get("content_sum") if d else None)
                out["feature"].append(
                    _feature_histogram(d["content"], feature_dim) if d else None
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(op, schema=DECODED_SCHEMA)


FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_ts_ms bigint, frame_sum bigint"


def sample_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame extraction: decode TPSV payloads in ``mapInPandas``
    and emit one row per sampled frame (every ``every_n``-th) with its
    timestamp and byte checksum. Non-video / undecodable rows emit nothing
    — same skip-don't-throw contract as ``decode_media``."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, sums = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_payload(p)
                if not d or d.get("format") != "tpsv":
                    continue
                for i in range(0, d["n_frames"], every_n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * TPSV_FRAME_MS)
                    sums.append(sum(d["frames"][i]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_ts_ms": tss,
                 "frame_sum": sums}
            )

    return df.select("media_id", "payload").mapInPandas(op, schema=FRAME_SCHEMA)


AHASH_SCHEMA = "media_id bigint, ahash bigint"


def image_ahash(df: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) per decodable image: the decoded gray
    pixels fold into 64 modular stripes (pixel i → stripe i mod 64); bit j
    of the fingerprint is 1 iff stripe j's mean exceeds the global pixel
    mean. Near-identical images differ in few stripe means → small Hamming
    distance; feed the output to ``dedup.hamming_pairs`` for blocked
    near-dup joins (the image analog of SimHash text dedup).

    Runs inside the Arrow ``mapInPandas`` decode stage (numpy bincount per
    image, no per-pixel Python); non-image / undecodable payloads emit
    nothing — same skip-don't-throw contract as ``decode_media``. The
    arithmetic (integer stripe sums, one float division each, strict >)
    is engine-portable, so the DuckDB oracle replays it exactly."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_payload(p)
                if not d or d.get("format") != "bmp":
                    continue
                content = d["content"]
                m = len(content)
                if m == 0:
                    continue
                arr = np.frombuffer(content, dtype=np.uint8).astype(np.float64)
                stripe = np.arange(m) % 64
                sums = np.bincount(stripe, weights=arr, minlength=64)
                cnts = np.bincount(stripe, minlength=64)
                gmean = arr.sum() / m
                v = 0
                for j in range(64):
                    mu = sums[j] / cnts[j] if cnts[j] else 0.0
                    if mu > gmean:
                        v |= 1 << j
                if v >= 1 << 63:  # two's-complement into a signed long
                    v -= 1 << 64
                ids.append(mid)
                hashes.append(v)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(op, schema=AHASH_SCHEMA)


def media_repartition_by_bytes(df: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Partition a media frame so the EXPECTED payload bytes per partition is
    ~``target_bytes``: one cheap aggregate measures the total payload size,
    the partition count is total/target, and rows scatter by
    (size class, hash(media_id)) — the size class in the key keeps the
    outlier payloads (which dominate decode memory) spread across
    partitions instead of hash-colliding. This is a statistical bound, not
    strict bin packing (strict packing needs a global prefix sum — a
    single-partition bottleneck at 100 TB); with payloads ≪ target_bytes
    the per-partition deviation concentrates tightly around the mean. Costs
    one extra pass over payload lengths, amortized by the decode stage that
    follows."""
    with_size = df.withColumn(
        "__bytes", F.coalesce(F.length("payload").cast("long"), F.lit(0))
    )
    total = with_size.agg(F.sum("__bytes")).first()[0] or 0
    floor_n = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    n = max(floor_n, -(-total // target_bytes))  # ceil
    # deterministic scatter: media_id spread × size class
    size_class = F.floor(F.log2(F.col("__bytes") + 2)).cast("int")
    salt = F.pmod(F.xxhash64("media_id"), F.lit(n)).cast("int")
    return with_size.repartition(n, size_class, salt).drop("__bytes")
