"""Map/array aggregate operators — native rewrites of the reference's UDAFs.

The reference ships five Scala ``UserDefinedAggregateFunction``s (SURVEY.md
A2-A6) plus external HLL UDAFs (A7). Each is re-expressed here as a pipeline
of built-in expressions (explode → hash-agg → re-collect), which — unlike the
Scala UDAFs — runs inside whole-stage codegen with map-side partial
aggregation, and scales as an ordinary shuffle on (group keys ⊕ entry key).

Determinism divergence (documented per SURVEY §7 "What's hard" #1):
``AggRowFirst``/``AggMapFirst`` are declared non-deterministic in the
reference (first-seen wins under task ordering, ``AggRowFirst.scala:26``).
Our versions take an explicit ``order_cols`` total order and are
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _entries(df: DataFrame, keys: list[str], map_col: str, extra: list[str]) -> DataFrame:
    """Explode a map column to (keys…, extra…, __mk, __mv) rows (internal
    aliases avoid collisions with caller column names)."""
    return df.select(
        *[F.col(c) for c in keys],
        *[F.col(c) for c in extra],
        F.explode(map_col).alias("__mk", "__mv"),
    )


def agg_map_sum_entries(df: DataFrame, keys: list[str], map_col: str) -> DataFrame:
    """A4 ``AggMapSum`` (AggMapSum.scala:10-58): pointwise per-key sum of a
    map column across the group, null values skipped; exploded entry form
    with columns (keys…, map_key, map_value).

    Semantics contract (shared by agg_map_first / agg_row_first): a group
    whose collections are ALL empty/null contributes no entry rows and is
    therefore ABSENT from the result — the relational UNNEST semantics
    the driver oracles define (the reference UDAF instead emits an empty
    per-group row; documented divergence, deliberate)."""
    return (
        _entries(df, keys, map_col, [])
        .where(F.col("__mv").isNotNull())
        .groupBy(*keys, "__mk")
        .agg(F.sum("__mv").alias("v"))
        .withColumnRenamed("__mk", "map_key")
        .withColumnRenamed("v", "map_value")
    )


def agg_map_sum(df: DataFrame, keys: list[str], map_col: str, out_col: str | None = None) -> DataFrame:
    """A4 with the reference's map-typed output (entries re-collected,
    sorted by key for a deterministic map ordering)."""
    out = out_col or map_col
    entries = agg_map_sum_entries(df, keys, map_col)
    return entries.groupBy(*keys).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("map_key", "map_value")))
        ).alias(out)
    )


def agg_map_first_entries(
    df: DataFrame, keys: list[str], map_col: str, order_cols: list[str]
) -> DataFrame:
    """A3 ``AggMapFirst`` (AggMapFirst.scala:10-54): first non-null value per
    map key across the group — "first" defined by ``order_cols`` (see module
    docstring on the determinism divergence); exploded entry form."""
    ordering = F.struct(*[F.col(c) for c in order_cols])
    return (
        _entries(df, keys, map_col, order_cols)
        .where(F.col("__mv").isNotNull())
        .groupBy(*keys, "__mk")
        .agg(F.min_by(F.col("__mv"), ordering).alias("v"))
        .withColumnRenamed("__mk", "map_key")
        .withColumnRenamed("v", "map_value")
    )


def agg_map_first(
    df: DataFrame, keys: list[str], map_col: str, order_cols: list[str],
    out_col: str | None = None,
) -> DataFrame:
    """A3 with map-typed output."""
    out = out_col or map_col
    entries = agg_map_first_entries(df, keys, map_col, order_cols)
    return entries.groupBy(*keys).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("map_key", "map_value")))
        ).alias(out)
    )


def agg_row_first(
    df: DataFrame,
    keys: list[str],
    array_col: str,
    id_field: str,
    order_cols: list[str],
    out_col: str | None = None,
) -> DataFrame:
    """A2 ``AggRowFirst`` (AggRowFirst.scala:11-49): input is an array-of-struct
    column; across the group keep one struct per distinct ``id_field`` (the
    first under ``order_cols``); output an array of the surviving structs,
    sorted by id for determinism (the reference's map-iteration order was
    unspecified)."""
    out = out_col or array_col
    ordering = F.struct(*[F.col(c) for c in order_cols])
    exploded = df.select(
        *keys, *order_cols, F.explode(array_col).alias("__item")
    )
    firsts = exploded.groupBy(*keys, F.col(f"__item.{id_field}").alias("__id")).agg(
        F.min_by(F.col("__item"), ordering).alias("__item")
    )
    return firsts.groupBy(*keys).agg(
        F.array_sort(F.collect_list(F.struct("__id", "__item"))).alias("__pairs")
    ).select(
        *keys,
        F.transform(F.col("__pairs"), lambda p: p["__item"]).alias(out),
    )


def agg_search_counts(
    df: DataFrame,
    keys: list[str],
    array_col: str,
    valid_sources: list[str],
    prefix: str = "search_count",
    engine_field: str = "engine",
    source_field: str = "source",
    count_field: str = "count",
) -> DataFrame:
    """A5 ``AggSearchCounts`` (AggSearchCounts.scala:10-86): filtered pivot-sum
    over an array<struct<engine,source,count>> column — per-source totals for
    allowlisted sources with count > 0, plus an ``_all`` total; flat columns
    ``<prefix>_all, <prefix>_<source>…`` ready for star-expansion.

    Implemented as explode_outer → pivot with an explicit value list (so the
    plan is static and a single shuffle). Groups whose arrays contain no
    allowlisted source still appear with zero counts, matching the UDAF's
    per-group evaluate; the count>0 filter lives inside the aggregate so it
    cannot drop groups."""
    item = F.explode_outer(array_col)
    exploded = df.select(*keys, item.alias("__s")).select(
        *keys,
        F.col(f"__s.{source_field}").alias("__source"),
        F.col(f"__s.{count_field}").alias("__count"),
    )
    pivoted = (
        exploded.groupBy(*keys)
        .pivot("__source", valid_sources)
        .agg(F.sum(F.when(F.col("__count") > 0, F.col("__count"))))
    )
    total = sum((F.coalesce(F.col(s), F.lit(0)) for s in valid_sources), F.lit(0))
    out = pivoted.select(
        *keys,
        total.cast("long").alias(f"{prefix}_all"),
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"{prefix}_{s}")
            for s in valid_sources
        ],
    )
    return out


# ---------------------------------------------------------------------------
# HLL distinct sketches (A7)
# ---------------------------------------------------------------------------


def hll_sketch(df: DataFrame, keys: list[str], value_col: str, sketch_col: str = "hll") -> DataFrame:
    """A7 mergeable distinct sketch (reference: spark-hyperloglog
    ``hll_create``+``HyperLogLogMerge``, udfs.scala:12-26). Spark ≥3.5
    ships Apache DataSketches HLL natively — this persists binary sketches
    exactly as the reference's datasets did."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(value_col).alias(sketch_col))


def hll_merge(df: DataFrame, keys: list[str], sketch_col: str = "hll") -> DataFrame:
    """Merge persisted sketches across groups (``HyperLogLogMerge`` analog)."""
    return df.groupBy(*keys).agg(F.hll_union_agg(sketch_col).alias(sketch_col))


def hll_estimate(df: DataFrame, sketch_col: str = "hll", out_col: str = "distinct_estimate") -> DataFrame:
    """``hll_cardinality`` analog."""
    return df.withColumn(out_col, F.hll_sketch_estimate(sketch_col))
