"""Time-series regularization: day-spine gap filling with linear
interpolation.

The downstream-analytics staple the reference's daily rollups assume away:
real per-key daily series have holes (quiet devices, dropped days), and
models/dashboards want a dense, regular grid. This fills each key's
[first observed day, last observed day] range and linearly interpolates
missing values between the nearest observed neighbors.

100 TB shape:
- ONE shuffle on the key: the min/max spine aggregate, the left join back,
  and both ignore-nulls windows all share the same (key) partitioning —
  Catalyst reuses one Exchange + sort for the join and the two window
  frames (forward scan + backward scan).
- The spine explode is days-per-key-sized (bounded by calendar span), never
  event-sized; the events table is touched only by the upstream daily
  aggregate.
- Interpolation is pure codegen arithmetic on DECIMAL-rounded inputs, so
  results are deterministic cross-engine (the registry.py discipline) and
  the whole operator carries an exact DuckDB oracle
  (``ts_gap_fill_interpolate``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_interpolate(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Dense (key, day, value, interpolated) grid from a sparse per-key
    daily series. Days inside a key's observed range that are missing get
    ``prev + (next - prev) * gap_fraction`` from the nearest observed
    neighbors (both always exist — the spine is bounded by observed days);
    observed days pass through unchanged with ``interpolated = false``."""
    spine = (
        daily.groupBy(key_col)
        .agg(F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1"))
        .select(
            key_col,
            F.explode(F.sequence("__d0", "__d1")).alias(day_col),
        )
    )
    # Join on (key, day) but keep BOTH sides hash-partitioned on key alone:
    # key-partitioning satisfies the join's clustered-distribution over
    # (key, day), and the two window frames below require exactly this
    # partitioning — so the whole operator runs on two Exchanges (spine
    # aggregate + this repartition) with the join and both windows reusing
    # them (plan-asserted in tests/test_timeseries.py).
    j = spine.join(
        daily.repartition(F.col(key_col)), [key_col, day_col], "left"
    )
    back = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_day = F.when(v.isNotNull(), F.col(day_col))
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_d = F.last(obs_day, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_d = F.first(obs_day, ignorenulls=True).over(fwd)
    frac = F.datediff(F.col(day_col), prev_d).cast("double") / F.datediff(
        next_d, prev_d
    ).cast("double")
    interp = F.round(
        prev_v.cast("double")
        + (next_v.cast("double") - prev_v.cast("double")) * frac,
        decimals,
    )
    return j.select(
        key_col,
        day_col,
        F.when(v.isNotNull(), v.cast("double"))
        .otherwise(interp)
        .alias(value_col),
        v.isNull().alias("interpolated"),
    )
