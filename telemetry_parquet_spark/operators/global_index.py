"""Distributed global sort index — dense 0-based row numbers in a total
order WITHOUT a single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the whole
dataset through ONE task — the classic scale cliff for curriculum ordering,
global ranking, and stable export numbering. The distributed construction:

1. ``repartitionByRange`` on the order columns (range shuffle; Spark
   samples split points, so partitions are balanced even on skewed keys),
2. sort within each partition (no cross-partition data movement),
3. count rows per partition (partition-count-sized aggregate — the ONLY
   driver-side materialization, ~one long per task),
4. broadcast the cumulative offsets back and add the within-partition
   ``row_number`` (partitioned window — no funnel).

The order must be TOTAL (callers append a unique tiebreak column) — the
result is then identical to the naive single-partition window, which is
exactly what the DuckDB oracle replays for `corpus_global_order`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_sort_index(
    df: DataFrame,
    order: list[Column],
    out_col: str = "global_idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a dense 0-based global index over a total ``order``.

    One range shuffle + one tiny (num-partitions-row) count collect; every
    other step is partition-local. Output partitioning/order is the range
    layout itself — ready for an ordered parquet export.

    Regimes: below a few million rows the naive global window is cheaper
    (the range-layout checkpoint dominates); measured 1.5× faster than the
    naive window at 48M rows on local[32], and at cluster scale the naive
    form is not slower but IMPOSSIBLE (one task sorts everything) — see
    SCALE.md."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
    )
    # cache: the counts pass and the output pass must see the SAME range
    # placement (repartitionByRange re-samples split points per action)
    ranged = ranged.localCheckpoint()
    counts = sorted(
        (r["__pid"], r["n"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    offset_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("__pid").orderBy(*order)
    return (
        ranged.withColumn(
            out_col,
            (F.row_number().over(w) - 1 + offset_map[F.col("__pid")]).cast("long"),
        )
        .drop("__pid")
    )
