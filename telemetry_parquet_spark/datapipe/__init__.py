"""LLM-training-data pipeline operators (BASELINE.json north star).

Net-new surface beyond the reference (SURVEY.md Phase 4): deduplication
families, embedding similarity search, text analysis, multimodal column
plumbing — all designed for 100 TB (shuffle-on-key fan-outs, broadcast query
sides, sketch-based pre-filters, no driver-side loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough input partitions before a compute-heavy per-row stage
    (shingling, hashing, scoring). A small/single-file scan yields one task
    and serializes the whole stage on one core; a 100 TB scan already has
    thousands of splits, so this is a no-op there — the repartition only
    fires when the scan under-parallelizes the CPU-bound work."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
