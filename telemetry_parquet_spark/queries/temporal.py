"""As-of / range join queries (net-new operator surface; DuckDB's native
ASOF JOIN and an exact BETWEEN join are the oracles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table


@query(
    "asof_last_purchase_before_view",
    oracle="""
    SELECT
      l.event_id,
      l.user_id,
      l.ts,
      r.ts AS purchase_ts,
      r.event_id AS purchase_event_id,
      r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'view') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_last_purchase_before_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each 'view' event enriched with the same user's
    most recent 'purchase' at-or-before it. Union-and-window implementation
    (operators/temporal_joins.py) — one shuffle on user_id, no nested loop."""
    from telemetry_parquet_spark.operators.temporal_joins import as_of_join

    events = load_table(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = as_of_join(
        views, purchases, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["event_id", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_right").alias("purchase_ts"),
        F.col("event_id_right").alias("purchase_event_id"),
        F.col("value_right").alias("purchase_value"),
    )


@query(
    "range_clicks_after_purchase",
    oracle="""
    SELECT
      c.event_id AS click_id,
      p.event_id AS purchase_id,
      c.user_id,
      c.ts AS click_ts,
      p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT event_id, user_id, ts,
                 ts + INTERVAL 2 HOUR AS window_end
          FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND c.ts >= p.ts AND c.ts < p.window_end
    """,
)
def range_clicks_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: clicks within 2 h after a purchase by the same
    user. Bucketized implementation — intervals exploded to hour buckets,
    equi-join on (user_id, bucket), exact predicate re-applied; never a
    BroadcastNestedLoopJoin."""
    from telemetry_parquet_spark.operators.temporal_joins import range_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("window_end"),
    )
    joined = range_join(
        clicks,
        purchases,
        left_ts="click_ts",
        start_col="purchase_ts",
        end_col="window_end",
        on="user_id",
        bucket_seconds=3600,
    )
    return joined.select(
        "click_id", "purchase_id", "user_id", "click_ts", "purchase_ts"
    )


@query(
    "rollup_order_volume",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup totals (net-new; reference has no grouping sets,
    SURVEY §2.4). NULL group markers match ANSI ROLLUP on both engines."""
    from telemetry_parquet_spark.queries.registry import dec

    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
        F.count("*").alias("n_orders"),
    )


@query(
    "ts_gap_fill_interpolate",
    oracle="""
    WITH daily AS (
      SELECT user_id % 25 AS bucket, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events
      WHERE event_type = 'error' AND value IS NOT NULL
      GROUP BY 1, 2
    ), spine AS (
      SELECT bucket, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM (SELECT bucket, MIN(day) AS d0, MAX(day) AS d1
            FROM daily GROUP BY bucket)
    ), joined AS (
      SELECT s.bucket, s.day, d.v,
             LAST_VALUE(d.v IGNORE NULLS) OVER (
               PARTITION BY s.bucket ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS)
               OVER (PARTITION BY s.bucket ORDER BY s.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             FIRST_VALUE(d.v IGNORE NULLS) OVER (
               PARTITION BY s.bucket ORDER BY s.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS)
               OVER (PARTITION BY s.bucket ORDER BY s.day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM spine s LEFT JOIN daily d USING (bucket, day)
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, day,
           CASE WHEN v IS NOT NULL THEN v
                ELSE round(pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
                                             / CAST(nd - pd AS DOUBLE)), 6)
           END AS v,
           (v IS NULL) AS interpolated
    FROM joined
    """,
)
def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily grid for the per-bucket 'error' value series: days
    missing inside a bucket's observed range are linearly interpolated
    between the nearest observed neighbors (operators/timeseries.py — one
    key-partitioned shuffle shared by spine join and both ignore-null
    window scans; spine explode is calendar-sized, never event-sized)."""
    from telemetry_parquet_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.where(
            (F.col("event_type") == "error") & F.col("value").isNotNull()
        )
        .groupBy(
            F.pmod(F.col("user_id"), F.lit(25)).alias("bucket"),
            F.to_date("ts").alias("day"),
        )
        .agg(
            F.sum(F.round("value", 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    return gap_fill_interpolate(
        daily, key_col="bucket", day_col="day", value_col="v"
    ).select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "day",
        "v",
        "interpolated",
    )
