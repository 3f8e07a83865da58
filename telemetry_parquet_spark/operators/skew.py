"""Skew-mitigation operators.

AQE's skew-join handling covers joins; for *aggregations* with a pathological
hot key, two-phase salted aggregation bounds any single task's input:
phase 1 aggregates on (key, salt) — the hot key's rows split across N salt
partitions with map-side partials — phase 2 merges the N partials per key.
Works for any algebraic aggregate (sum/count/min/max); the result is
identical to the direct groupBy (oracle-checked in the query pack).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → (merge_fn_name,
    phase-1 aggregate expression), where merge_fn is 'sum'|'min'|'max'
    (how phase-2 combines phase-1 partials). COUNT is expressed as a
    phase-1 ``F.count(...)`` merged with 'sum'."""
    # the salt must be DETERMINISTIC per row: monotonically_increasing_id
    # changes under task retries, re-routing recomputed rows to different
    # phase-1 partitions while other reducers keep already-fetched data —
    # rows summed twice or dropped (pagerank.py salts on a real column for
    # the same reason). Default: hash of the full row content.
    if salt_on:
        salt_cols = [F.col(salt_on)]
    else:
        salt_cols = [F.col(c) for c in df.columns]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (_, expr) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    phase2 = phase1.groupBy(*keys).agg(
        *[merge[fn](F.col(name)).alias(name) for name, (fn, _) in aggs.items()]
    )
    return phase2


def key_skew_profile(df: DataFrame, key_col: str, label: str) -> DataFrame:
    """One-row skew diagnosis for a prospective shuffle key: row count,
    distinct keys, hottest-key count, and skew_ratio = max/mean key count
    (1.0 = perfectly uniform; >> 1 = a hot key that will straggle any
    groupBy/join on this column).

    The pre-flight a 100 TB job runs BEFORE choosing join/agg keys —
    feeding directly into the mitigation knobs this repo ships
    (``salted_agg``, ``cap_per_stratum(salt_buckets=...)``, AQE skew
    join). Cost: one map-side-combinable count per key plus a 1-row
    reduce; union several profiles into one report DataFrame."""
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count("*").alias("__c")
    )
    return counts.agg(
        F.lit(label).alias("keyspace"),
        F.sum("__c").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("__c").alias("max_cnt"),
        F.round(
            F.max("__c").cast("double") * F.count("*") / F.sum("__c"), 6
        ).alias("skew_ratio"),
    )
