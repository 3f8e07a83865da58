"""Hash / bucketing functions (SURVEY.md F10-F12).

- block_id: ``crc32(s) % n`` deterministic sample/block id
  (``utils/package.scala:156-160``) — Spark's crc32 is the same CRC-32 as
  zlib, so ids are bit-compatible with the reference.
- positive_id_hash: stable positive int id for ML factorization
  (``AddonRecommender.scala:84`` used JVM ``hashCode & 0x7FFFFF``; our spec
  is xxhash64-based — semantics "stable positive id", documented as
  non-bit-compatible, SURVEY §7 #5).
- bucketed: first split ≥ value, else max+1 (``udfs.scala:17-19``) — a
  when-chain, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def block_id(col: Column | str, num_blocks: int = 100) -> Column:
    """F11: crc32(value) % num_blocks (bit-compatible with the reference)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.crc32(c.cast("string")), F.lit(num_blocks)).cast("int")


def positive_id_hash(col: Column | str, bits: int = 23) -> Column:
    """F12: stable positive int id in [0, 2^bits)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(1 << bits)).cast("int")


def bucketed(col: Column | str, splits: list[float]) -> Column:
    """F10: index semantics of the reference's histogram binning UDF — the
    first split >= value; values above all splits get max(splits)+1."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(max(splits) + 1)
    for s in sorted(splits, reverse=True):
        expr = F.when(c <= s, F.lit(s)).otherwise(expr)
    return expr
