"""Mergeable log-linear quantile sketch (HDR-histogram binning).

The exact quantile queries (``len_quantiles_by_lang``,
``percentile_stats``) sort or `quantile_cont` over the raw values — fine
per-group, but at 100 TB a GLOBAL quantile over a corpus-sized column wants a
sketch: a fixed, data-independent binning whose per-bin counts are plain
integers, mergeable by ``groupBy().sum()`` across days/sources/shards, with a
deterministic bounded-relative-error quantile read-out. This is the
discipline of the HDR histogram / DDSketch family (log buckets with linear
sub-buckets), chosen over t-digest precisely because its state is
INTEGER-EXACT — sketch content replays bit-for-bit in any engine, so the
oracle compares the actual sketch, not just behavior (the
``datapipe/count_min.py`` standard).

Binning: values below ``2 * SUBBINS`` get singleton exact bins; every other
value lands in one of ``SUBBINS`` equal-width sub-bins of its power-of-two
decade ``[2^(m-1), 2^m)``. With SUBBINS=4 the bin width is at most 1/4 of the
bin's lower bound, so any quantile read from bin edges carries ≤ 25% relative
error — and the error bound is structural, not probabilistic.

All arithmetic is integer (`bin()` string length for the decade, shifts and
integer division for the sub-bin), identical in Spark and DuckDB; the two
engines' ``bin()`` both render minimal-width binary.

100 TB shape: the sketch build is ONE map-side-combinable hash aggregate on a
derived integer key — the shuffle carries (group, bin, partial count), i.e.
bins × groups rows, regardless of corpus size. Merging partial sketches is
the same aggregate again. The quantile read-out windows over the
POST-AGGREGATION sketch (≤ ~64 × SUBBINS rows per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUBBINS = 4

# Integer-exact bin bounds for a non-negative integer column expression.
# {x} is substituted; `div` is Spark's integer division. Values < 2*SUBBINS
# are their own bin (the decade width there is < SUBBINS, so sub-binning
# would degenerate); larger values use decade lo = 2^(m-1), width w = lo/4.
_SPARK_BIN = """
CASE WHEN {x} < {small} THEN named_struct('bin_lo', CAST({x} AS BIGINT),
                                          'bin_hi', CAST({x} AS BIGINT))
ELSE named_struct(
  'bin_lo', {lo} + (({x} - {lo}) div ({lo} div {sb})) * ({lo} div {sb}),
  'bin_hi', {lo} + ((({x} - {lo}) div ({lo} div {sb})) + 1) * ({lo} div {sb}) - 1
) END
""".replace("{lo}", "shiftleft(CAST(1 AS BIGINT), length(bin({x})) - 1)")

# Same arithmetic in DuckDB spelling (`//` integer division, `<<` shift).
DUCKDB_BIN = """
CASE WHEN {x} < {small} THEN {{'bin_lo': CAST({x} AS BIGINT),
                               'bin_hi': CAST({x} AS BIGINT)}}
ELSE {{'bin_lo': {lo} + (({x} - {lo}) // ({lo} // {sb})) * ({lo} // {sb}),
      'bin_hi': {lo} + ((({x} - {lo}) // ({lo} // {sb})) + 1) * ({lo} // {sb}) - 1}}
END
""".replace("{lo}", "(CAST(1 AS BIGINT) << (length(bin({x})) - 1))")


def spark_bin_expr(x: str) -> F.Column:
    """struct(bin_lo, bin_hi) for column name ``x`` — pure codegen."""
    return F.expr(_SPARK_BIN.format(x=x, small=2 * SUBBINS, sb=SUBBINS))


def duckdb_bin_sql(x: str) -> str:
    return DUCKDB_BIN.format(x=x, small=2 * SUBBINS, sb=SUBBINS)


def histogram(df: DataFrame, value_col: str, *group_cols: str) -> DataFrame:
    """(group..., bin_lo, bin_hi, cnt) — the mergeable sketch state. Merging
    shards/days is the same groupBy-sum over (group, bin_lo, bin_hi)."""
    binned = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, spark_bin_expr(value_col).alias("b")
    )
    return binned.groupBy(*group_cols, "b.bin_lo", "b.bin_hi").agg(
        F.count("*").alias("cnt")
    )


def quantiles_from_hist(
    hist: DataFrame, group_cols: list[str], qs: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """(group..., q, q_bound, total): smallest bin_hi whose cumulative count
    reaches q% of the group's total. Integer comparisons only
    (``cum * 100 >= q * total``) — no float rank arithmetic to drift.

    The window and join run over the post-aggregation sketch, whose size is
    bins × groups — driver-trivial at any corpus scale."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin_lo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy(*group_cols).agg(F.sum("cnt").alias("total"))
    qlit = F.explode(F.array(*[F.lit(q) for q in qs])).alias("q")
    return (
        cum.join(tot, list(group_cols))
        .select(*group_cols, "bin_hi", "cum", "total", qlit)
        .where(F.col("cum") * 100 >= F.col("q") * F.col("total"))
        .groupBy(*group_cols, "q")
        .agg(F.min("bin_hi").alias("q_bound"), F.first("total").alias("total"))
    )
