"""Z-order (Morton-curve) clustering for multi-column data skipping.

Parquet data skipping is min/max based: a scan with ``WHERE x = k`` skips a
file only if the file's [min(x), max(x)] excludes k. Linear sort on x makes
x-ranges tight but leaves every other column's range full-width per file —
a filter on y skips nothing. Interleaving the bits of (x, y) into one
Morton code and range-partitioning + sorting on it makes files cover small
*rectangles* of (x, y) space, so min/max pruning works on BOTH columns.
This is the layout operator behind "ZORDER BY" in lakehouse engines (public
bit-interleave construction — Morton 1966), re-expressed as pure Spark
column arithmetic: the code is computed by the classic parallel-bit-spread
magic numbers, whole-stage codegen'd, no UDF.

Scale notes (100 TB):
- the write is ONE range shuffle on the morton code (same cost as any
  sorted export); skipping benefits accrue to every subsequent scan;
- bit arithmetic is on BIGINT with 16-bit inputs — no overflow, ANSI-safe;
- for >2 columns the same spread generalizes (interleave stride = n_cols);
  16 bits/column keeps two columns inside a 32-bit code.

`tests/test_layout.py` proves the skipping property from parquet footer
metadata: after z-order layout, per-file (x, y) rectangles shrink on BOTH
axes, where a linear sort narrows only its own column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Parallel bit spread: 16 input bits to the even bit positions of 32.
# (value, mask) pairs applied as x = (x | x << shift) & mask.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` to even bit positions (bits 0,2,..30)."""
    x = c.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_code(x: Column | str, y: Column | str) -> Column:
    """Morton interleave of two 16-bit-masked columns: x takes even bits,
    y odd bits. Equal-prefix codes are spatially adjacent in (x, y)."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    return _spread16(cx).bitwiseOR(F.shiftleft(_spread16(cy), 1))


def cluster_zorder(
    df: DataFrame,
    x: str,
    y: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Re-layout ``df`` along the Morton curve of (x, y): range-partition +
    sort on the code. Write the result with any sink; each output file then
    covers a small (x, y) rectangle, enabling min/max skipping on both
    columns."""
    code = zorder_code(x, y).alias("__z")
    return (
        df.withColumn("__z", code)
        .repartitionByRange(num_partitions, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


# --- data-adaptive variant -------------------------------------------------
#
# ``zorder_code`` interleaves the RAW low 16 bits — perfect when both
# domains are dense small integers (the grid test), useless when values are
# wide (64-bit ids: the low bits are noise) or skewed (most raw codes share
# a tiny sub-rectangle and the curve degenerates to a linear sort). The
# adaptive variant first maps each value to its EXACT rank-CDF bucket
# ``(rows_before_value * 2^bits) div total_rows`` — equal-frequency tiles,
# the same boundary discipline Delta's OPTIMIZE ZORDER applies via range
# ids — then interleaves the buckets. All-integer math, so a SQL oracle
# replays it bit-for-bit (`layout_zorder_keys`).
#
# Scale: the CDF is built on the distinct-value HISTOGRAM (domain-sized
# window, the vocab-sized-state pattern) and broadcast back, so the fact
# table acquires its key with ZERO shuffles; the one range shuffle is the
# write layout itself. For open 100 TB domains swap the exact CDF for
# ``approxQuantile`` boundaries — interleave and layout are unchanged.


def rank_bucket_map(df: DataFrame, col: str, bits: int = 8) -> DataFrame:
    """value -> exact equal-frequency bucket in [0, 2^bits): domain-sized
    histogram, cumulative count over distinct values, integer division."""
    from pyspark.sql import Window

    b = 1 << bits
    hist = df.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("cnt"))
    total = df.agg(F.count("*").alias("n"))
    cume = hist.withColumn(
        "start", F.sum("cnt").over(Window.orderBy("v")) - F.col("cnt")
    )
    return cume.crossJoin(F.broadcast(total)).select(
        "v", F.expr(f"(start * {b}) div n").alias("bucket")
    )


def zorder_key_adaptive(
    df: DataFrame, x: str, y: str, bits: int = 8, out_col: str = "zval"
) -> DataFrame:
    """Attach ``out_col`` = Morton code of the two columns' rank buckets.
    The input never shuffles: both bucket maps are domain-sized broadcasts;
    the interleave reuses ``zorder_code`` (buckets fit 16 bits)."""
    bx = rank_bucket_map(df, x, bits)
    by = rank_bucket_map(df, y, bits)
    return (
        df.join(F.broadcast(bx), df[x] == bx["v"], "left")
        .drop("v")
        .withColumnRenamed("bucket", "_bx")
        .join(F.broadcast(by), df[y] == by["v"], "left")
        .drop("v")
        .withColumnRenamed("bucket", "_by")
        .withColumn(out_col, zorder_code(F.col("_bx"), F.col("_by")))
        .drop("_bx", "_by")
    )


def cluster_zorder_adaptive(
    df: DataFrame, x: str, y: str, num_files: int, bits: int = 8
) -> DataFrame:
    """``cluster_zorder`` for wide/skewed domains: equal-frequency tiles
    via the rank-CDF buckets, then the same one-range-shuffle layout."""
    keyed = zorder_key_adaptive(df, x, y, bits=bits)
    return keyed.repartitionByRange(num_files, F.col("zval")).sortWithinPartitions(
        "zval"
    )
