"""Top-k operators (SURVEY.md O2 global, O3 per-group).

Reference: driver-side ``sortWith(..).take(top)`` (``AddonRecommender.scala:179-182``)
and the CollectList UDAF's per-group sort+trim (``CollectList.scala:56-160``).
Spark-first: ``orderBy(..).limit(k)`` compiles to TakeOrderedAndProject — each
partition keeps a k-heap and the driver merges k·P candidates, no global sort.
Per-group top-k is a rank-filter: one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k (O2). ``order`` should end with a unique tiebreak column."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Per-group top-k (O3) keeping the rank column."""
    w = W.partitionBy(*keys).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )


def collect_top_k_per_group(
    df: DataFrame,
    keys: list[str],
    order_cols: list[tuple[str, bool]],
    payload_cols: list[str],
    k: int,
    out_col: str = "collected",
) -> DataFrame:
    """CollectList-UDAF semantics (A6/O3, ``CollectList.scala:15-166``):
    per group, collect payload structs, co-sort by ``order_cols``
    (``(name, descending)`` pairs, nulls last as the UDAF does), trim to ``k``.

    Expressed as collect_list → array_sort(comparator) → slice — all JVM-side
    higher-order functions, no UDAF. Null retention: payload values ride
    inside structs, which collect_list keeps (the built-in only drops
    top-level nulls — the UDAF existed for exactly this, CollectList.scala:17-20).
    """
    struct_cols = [F.col(c) for c in dict.fromkeys([c for c, _ in order_cols] + payload_cols)]
    collected = df.groupBy(*keys).agg(
        F.collect_list(F.struct(*struct_cols)).alias("__items")
    )

    def cmp(a: Column, b: Column) -> Column:
        """Multi-key comparator: descending-or-ascending per key, nulls last."""
        result = F.lit(0)
        for name, desc in reversed(order_cols):
            av, bv = a[name], b[name]
            lt, gt = (F.lit(1), F.lit(-1)) if desc else (F.lit(-1), F.lit(1))
            key_cmp = (
                F.when(av.isNull() & bv.isNull(), F.lit(0))
                .when(av.isNull(), F.lit(1))   # nulls last
                .when(bv.isNull(), F.lit(-1))
                .when(av < bv, lt)
                .when(av > bv, gt)
                .otherwise(F.lit(0))
            )
            result = F.when(key_cmp != 0, key_cmp).otherwise(result)
        return result

    sorted_trimmed = F.slice(F.array_sort(F.col("__items"), cmp), 1, k)
    return collected.select(*keys, sorted_trimmed.alias(out_col))
