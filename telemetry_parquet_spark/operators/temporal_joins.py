"""As-of and range joins — operators Spark lacks natively (SURVEY.md §2.3
notes the reference has none either; they are engine-completeness surface,
per the common-OLAP-pattern list in the public Spark guidance).

Both avoid the naive O(N·M) nested-loop plan:

- ``as_of_join``: union-and-window. Tag right rows, union with left rows,
  sort within each key by (ts, tag) once, and carry the latest right payload
  forward with ``last(ignorenulls)``. One shuffle on the key, no join at all —
  this is the merge-asof algorithm expressed relationally, and it scales as a
  single window over (key, time)-sorted data.
- ``range_join``: bucketize the time axis, explode each right-side interval
  to the buckets it covers, equi-join on (key?, bucket), then re-apply the
  exact range predicate. Shuffle keys are (key, bucket) — broadcastable when
  the interval side is small; bucket width trades fan-out vs selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
    deterministic_ties: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` for the same ``on`` key (ties: right row at the
    exact same timestamp wins, i.e. 'backward' semantics inclusive; among
    MULTIPLE right rows sharing that timestamp the payload-struct-largest
    one wins when ``deterministic_ties`` — repeatable across runs and
    partitionings; set it False if the payload contains unorderable types
    like maps).

    ``tolerance_seconds`` drops matches older than the window (like
    pandas ``merge_asof(tolerance=...)``), evaluated at SECOND-BOUNDARY
    granularity (``unix_timestamp`` truncation — identical to the
    oracle's ``date_diff('second', …)``; sub-second age is not
    counted, by contract)."""
    payload_cols = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lhs = left.withColumn("__ts", F.col(left_ts)).withColumn("__tag", F.lit(1))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(right_ts).alias(f"{right_ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
        ).alias("__r"),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows (tag 0) sort before left rows (tag 1) at equal __ts, so an
    # exact-timestamp right row is visible to the left row — inclusive asof.
    order = [F.col("__ts").asc(), F.col("__tag").asc()]
    if deterministic_ties:
        order.append(F.col("__r").asc())
    w = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = carried.where(F.col("__tag") == 1)
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.unix_timestamp(F.col("__ts"))
                - F.unix_timestamp(F.col(f"__match.{right_ts}{suffix}"))
                <= tolerance_seconds,
                F.col("__match"),
            ),
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col(f"__match.{right_ts}{suffix}").alias(f"{right_ts}{suffix}"),
        *[
            F.col(f"__match.{c}{suffix}").alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    on: str | None = None,
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows where
    ``start_col <= left_ts < end_col`` (optionally also equi on ``on``).

    Implementation: explode each interval into the time buckets it overlaps,
    equi-join points on their bucket (+ key) with the exact range predicate
    INSIDE the join condition. Equivalent to the 'bucketize the range key'
    strategy; never a nested loop. A matching pair coincides in exactly one
    bucket (the point's), so no post-join dedup is needed.

    Because the exact predicate is part of the join condition (not a WHERE
    after it), ``how='left'`` keeps unmatched point rows with nulls in the
    interval columns instead of silently collapsing to inner semantics."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"range_join supports inner/left joins, got {how!r}")
    bucket = (F.unix_timestamp(F.col(left_ts)) / bucket_seconds).cast("long")
    start_b = (F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long")
    end_b = (F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long")

    exploded = intervals.withColumn(
        "__bucket", F.explode(F.sequence(start_b, end_b))
    ).alias("__r")
    pts = left.withColumn("__bucket", bucket).alias("__l")
    cond = F.col("__l.__bucket") == F.col("__r.__bucket")
    if on:
        cond &= F.col(f"__l.{on}") == F.col(f"__r.{on}")
    cond &= (F.col(f"__r.{start_col}") <= F.col(f"__l.{left_ts}")) & (
        F.col(f"__l.{left_ts}") < F.col(f"__r.{end_col}")
    )
    joined = pts.join(exploded, cond, how)
    # merge the equi-key columns back to single names (left side wins; for
    # inner joins the sides are equal, for left joins the right side is null)
    drops = [F.col("__l.__bucket"), F.col("__r.__bucket")]
    if on:
        drops.append(F.col(f"__r.{on}"))
    for c in drops:
        joined = joined.drop(c)
    return joined
