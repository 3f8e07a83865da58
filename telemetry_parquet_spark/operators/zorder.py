"""Z-order (Morton) multi-dimensional layout clustering — the data-layout
operator behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, re-expressed as plain
DataFrame algebra so the write layout it produces is parquet-pruning-optimal
on EVERY clustered column at once.

Why it matters at 100 TB: a table sorted on one key has tight per-file
min/max footer ranges on that key only — a predicate on any other column
still touches every file. Interleaving the bits of per-column rank buckets
puts rows that are close in ALL dimensions into the same file, so a box
predicate (``partkey BETWEEN .. AND suppkey BETWEEN ..``) prunes to
O(perimeter) files instead of scanning all of them. The effectiveness test
measures this directly from the written footers.

Construction (exact, deterministic, cross-engine — no sampling):

1. Per dimension, an EXACT integer CDF over the distinct-value histogram:
   ``bucket(v) = (rows_before_v * 2^bits) div total_rows``. All ties share a
   bucket; integer division only, so DuckDB replays it bit-for-bit. The
   cumulative window runs over the DISTINCT values (domain-sized, like the
   vocab-sized sketches elsewhere), never the corpus; at open-domain 100 TB
   scale swap in ``approxQuantile`` boundaries behind the same bucket
   column — the interleave and layout steps are unchanged.
2. The corpus picks up its buckets via broadcast joins on the domain-sized
   bucket maps — the fact table itself NEVER shuffles to get its z-value.
3. ``zorder_layout`` then does the one unavoidable shuffle: a
   ``repartitionByRange`` on the z-value (Spark range-samples split points,
   so skewed hotspots still balance) + partition-local sort, ready to write.

No reference counterpart (the reference writes single-column-partitioned
output only, telemetry-batch-view ``Dataset.scala`` day layout); net-new
surface motivated by its daily-rollup storage layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interleave_bits(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton-interleave two ``bits``-wide non-negative ints: bit i of ``x``
    lands at position 2i, bit i of ``y`` at 2i+1. Pure shift/AND arithmetic
    — whole-stage-codegen'd, and replayable verbatim in ANSI SQL."""
    z = F.lit(0)
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def _bucket_map(df: DataFrame, col: str, bits: int) -> DataFrame:
    """value -> exact-CDF bucket in [0, 2^bits): domain-sized histogram,
    cumulative count over distinct values, integer-division bucket. The
    window is over the distinct-value histogram (domain-sized), not rows."""
    b = 1 << bits
    hist = df.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("cnt"))
    total = df.agg(F.count("*").alias("n"))
    cume = hist.withColumn(
        "start", F.sum("cnt").over(Window.orderBy("v")) - F.col("cnt")
    )
    return (
        cume.crossJoin(F.broadcast(total))
        .select("v", F.expr(f"(start * {b}) div n").alias("bucket"))
    )


def zorder_key(
    df: DataFrame, cols: tuple[str, str], bits: int = 8, out_col: str = "zval"
) -> DataFrame:
    """Attach ``out_col`` = Morton code of the two columns' exact-CDF rank
    buckets. The input never shuffles: both bucket maps are domain-sized
    and broadcast."""
    cx, cy = cols
    bx = _bucket_map(df, cx, bits)
    by = _bucket_map(df, cy, bits)
    return (
        df.join(F.broadcast(bx), df[cx] == bx["v"], "left")
        .drop("v")
        .withColumnRenamed("bucket", "_bx")
        .join(F.broadcast(by), df[cy] == by["v"], "left")
        .drop("v")
        .withColumnRenamed("bucket", "_by")
        .withColumn(out_col, interleave_bits(F.col("_bx"), F.col("_by"), bits))
        .drop("_bx", "_by")
    )


def zorder_layout(
    df: DataFrame,
    cols: tuple[str, str],
    num_files: int,
    bits: int = 8,
) -> DataFrame:
    """Cluster ``df`` for writing: z-key, one range shuffle on the key,
    partition-local sort. ``.write.parquet(...)`` on the result yields
    ``num_files`` files whose footer min/max ranges are tight on BOTH
    columns — the layout the effectiveness test measures."""
    keyed = zorder_key(df, cols, bits=bits)
    return keyed.repartitionByRange(num_files, F.col("zval")).sortWithinPartitions(
        "zval"
    )
