"""Deduplication operators (SURVEY.md A1, J1+A1 incremental pipeline, W1).

Reference semantics:
- latest-per-key: ``row_number() OVER (PARTITION BY … ORDER BY … DESC) = 1``
  (``AddonRecommender.scala:123-130``).
- earliest-wins argmin: ``groupByKey(..).reduceGroups((a,b) => if (a.ts <= b.ts) a else b)``
  (``PioneerOnlineNewsDedupe.scala:119-121``).
- incremental cross-day dedup: union of prior deduped days → 5-key left_anti →
  earliest-wins (``PioneerOnlineNewsDedupe.scala:97-121``).

Scale notes: rank-filter dedup is one shuffle on the key; ``min_by`` over a
struct is the same shuffle but with map-side partial aggregation (smaller
shuffle payload when many duplicates share a key) — that is why
``earliest_per_key`` uses min_by rather than a window. The incremental dedup's
anti-join shuffles only the key columns of the (large) prior state; AQE picks
broadcast when a day's new data is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: list[str], order: list[Column], rank_col: str = "__rn"
) -> DataFrame:
    """Keep the first row per key under ``order`` (W1). ``order`` should end
    with a unique column for determinism."""
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) == 1)
        .drop(rank_col)
    )


def earliest_per_key(
    df: DataFrame, keys: list[str], order_cols: list[str]
) -> DataFrame:
    """Argmin group-reduce (A1): earliest row per key by ``order_cols``
    lexicographically. Implemented with ``min_by`` over an ordering struct —
    partial-aggregatable, so the shuffle carries one candidate row per
    (partition, key) instead of every row."""
    ordering = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(*[F.col(c) for c in df.columns])
    agg = df.groupBy(*keys).agg(F.min_by(payload, ordering).alias("__row"))
    return agg.select(*[F.col(f"__row.{c}").alias(c) for c in df.columns])


def incremental_dedup(
    new_entries: DataFrame,
    prior_state: DataFrame | None,
    dedup_keys: list[str],
    earliest_cols: list[str],
) -> DataFrame:
    """One step of the reference's incremental dedup pipeline
    (``PioneerOnlineNewsDedupe.scala:97-121``):

    1. drop rows whose ``dedup_keys`` already exist in ``prior_state``
       (multi-key left_anti, J1);
    2. among the surviving rows, keep the earliest per key (A1).

    The reference's write-temp-and-reread materialization barrier
    (``:107-110``) is not replicated — AQE replans between stages.
    """
    candidates = new_entries
    if prior_state is not None:
        candidates = new_entries.join(
            prior_state.select(*dedup_keys), on=dedup_keys, how="left_anti"
        )
    return earliest_per_key(candidates, keys=dedup_keys, order_cols=earliest_cols)


def exact_dedup(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal: ``dropDuplicates`` over ``keys`` (all columns
    if None). Non-deterministic winner — use ``earliest_per_key`` when the
    surviving row matters."""
    return df.dropDuplicates(keys) if keys else df.dropDuplicates()
