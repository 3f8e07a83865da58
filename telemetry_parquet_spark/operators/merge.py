"""MERGE / upsert / SCD2 emulation — the CDC surface a lakehouse table
format would provide, built from anti-join + union + window (no Delta/
Iceberg jars in this environment; the emulation is the documented pattern
for plain-parquet lakes).

- ``merge_upsert``: MERGE INTO target USING source ON keys WHEN MATCHED
  UPDATE ALL WHEN NOT MATCHED INSERT ALL — as target-minus-matched ∪ source.
- ``scd2_apply``: slowly-changing-dimension type 2 — close the current
  version of changed keys (valid_to = change ts) and append new open
  versions.

Scale: both are one shuffle on the merge keys (the anti-join); combined
with partitioned dynamic overwrite the rewrite touches only partitions
containing matched keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Upsert semantics: source rows win on key collision; unmatched target
    rows survive. Column sets must match."""
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"column mismatch: {sorted(target.columns)} vs {sorted(source.columns)}"
        )
    kept = target.join(source.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(source)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    change_ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """SCD2: ``dim`` carries (business cols…, valid_from, valid_to,
    is_current); ``changes`` carries (business cols…, change_ts_col).

    For each changed key: the open version is closed (valid_to := change
    ts, is_current := false) and a new open version appended. Unchanged
    keys and already-closed history pass through untouched. If multiple
    changes per key arrive in one batch, only the latest becomes the open
    version; intermediate ones become closed versions chained by
    timestamp."""
    from pyspark.sql import Window as W

    attr_cols = [c for c in changes.columns if c != change_ts_col]

    # order changes per key; chain valid_from/valid_to
    w = W.partitionBy(*keys).orderBy(F.col(change_ts_col).asc())
    chained = (
        changes.withColumn("__next_ts", F.lead(change_ts_col).over(w))
        .withColumn(valid_from, F.col(change_ts_col))
        .withColumn(valid_to, F.col("__next_ts"))
        .withColumn(is_current, F.col("__next_ts").isNull())
        # attr_cols excludes change_ts_col by construction, so the drop
        # is unconditional
        .drop("__next_ts", change_ts_col)
    )

    changed_keys = changes.select(*keys).distinct()
    first_change = changes.groupBy(*keys).agg(
        F.min(change_ts_col).alias("__first_ts")
    )

    # close the open versions of changed keys at the first incoming change
    open_changed = (
        dim.where(F.col(is_current))
        .join(first_change, on=keys, how="inner")
        .withColumn(valid_to, F.col("__first_ts"))
        .withColumn(is_current, F.lit(False))
        .drop("__first_ts")
    )
    untouched_open = dim.where(F.col(is_current)).join(
        changed_keys, on=keys, how="left_anti"
    )
    # NULL is_current counts as closed history: where(col) and
    # where(~col) BOTH exclude nulls, so such rows silently vanished
    # from every apply — permanent data loss for dims written by jobs
    # that left the flag unset
    closed_history = dim.where(
        ~F.coalesce(F.col(is_current), F.lit(False))
    )

    return (
        closed_history.unionByName(untouched_open)
        .unionByName(open_changed)
        .unionByName(chained.select(*closed_history.columns))
    )
