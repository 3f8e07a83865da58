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


@query(
    "ts_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT event_type, day, n,
             COUNT(*) OVER f AS c,
             SUM(n) OVER f AS s,
             SUM(n * n) OVER f AS ss
      FROM daily
      WINDOW f AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ), scored AS (
      SELECT event_type, day, n, c,
             CAST(s AS DOUBLE) / c AS mean7,
             sqrt(greatest((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / c)
                           / c, 0.0)) AS sd7
      FROM w
    )
    SELECT event_type, day, n,
           round(CASE WHEN c >= 2 THEN mean7 END, 6) AS mean7,
           round(CASE WHEN c >= 2 AND sd7 <> 0.0
                      THEN (n - mean7) / sd7 END, 6) AS z,
           COALESCE(CASE WHEN c >= 2 AND sd7 <> 0.0
                         THEN abs((n - mean7) / sd7) > 2.0 END,
                    FALSE) AS is_anomaly
    FROM scored
    """,
)
def ts_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scoring on the per-type daily event-count
    series: each day's count against the mean/stddev of its previous ≤7
    observed days (population stddev; warm-up and flat windows yield NULL
    z, never a division error). The monitoring sibling of
    ``ts_gap_fill_interpolate`` — the alerting query every telemetry
    pipeline runs on its daily rollups.

    Scale: one map-side-combinable daily count agg, then three window
    aggregates over the SAME (event_type)-partitioned day-ordered frame —
    one shuffle of a days×types-sized table. Integer counts make every
    windowed sum exact; the z arithmetic is a single double expression
    mirrored operation-for-operation in the oracle."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    f = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    c = F.count("n").over(f)
    s = F.sum("n").over(f)
    ss = F.sum(F.col("n") * F.col("n")).over(f)
    mean7 = s.cast("double") / c
    sd7 = F.sqrt(
        F.greatest(
            (ss.cast("double") - s.cast("double") * s / c) / c, F.lit(0.0)
        )
    )
    z = F.when((c >= 2) & (sd7 != 0.0), (F.col("n") - mean7) / sd7)
    return daily.select(
        "event_type",
        "day",
        "n",
        F.round(F.when(c >= 2, mean7), 6).alias("mean7"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("is_anomaly"),
    )


@query(
    "ts_ohlc_bars",
    oracle="""
    SELECT event_type, bar_ts,
           first(value ORDER BY ts, event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY ts, event_id) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM (
      SELECT event_type, date_trunc('hour', ts) AS bar_ts,
             ts, event_id, value
      FROM events
    )
    GROUP BY 1, 2
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the candlestick rollup every
    metrics/market pipeline materializes: open/close are the first/last
    value in (ts, event_id) order (total tie-break), high/low are plain
    extrema, volume is the DECIMAL-exact value sum.

    Scale: ONE map-side-combinable hash aggregation — min_by/max_by carry a
    single (value, key) pair per group through the partial aggregate, so
    the shuffle is bars-sized, never events-sized; no window, no sort. The
    open/close values are raw column doubles (no float arithmetic), so the
    oracle matches without rounding."""
    from telemetry_parquet_spark.queries.registry import dec

    ev = load_table(spark, sf_dir, "events")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bar_ts")
    ).agg(
        F.min_by("value", ordkey).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ordkey).alias("close"),
        F.count("*").alias("n_events"),
        F.sum(dec("value")).cast("double").alias("volume"),
    )


@query(
    "ts_hypertable_rollup",
    oracle="""
    SELECT 'hour' AS granularity, event_type,
           date_trunc('hour', ts) AS bucket_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
           MIN(value) AS vmin, MAX(value) AS vmax
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'day', event_type, date_trunc('day', ts),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE),
           MIN(value), MAX(value)
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'week', event_type, date_trunc('week', ts),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE),
           MIN(value), MAX(value)
    FROM events GROUP BY 2, 3
    """,
)
def ts_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity continuous aggregate (the hypertable rollup):
    hour, day, and week buckets per event type from ONE corpus scan.

    Scale: the cascade re-aggregates each level from the level below —
    hours from events (the only corpus-sized aggregation), days from the
    hour relation, weeks from days — so the corpus is scanned and shuffled
    exactly once and every higher granularity costs only a bucket-sized
    hash agg. DECIMAL sums + counts + extrema are associative, so the
    cascade is bit-equal to computing each granularity directly from the
    corpus — which is exactly what the oracle does (three direct GROUP
    BYs), making the equivalence the thing the driver checks. The hour
    relation is localCheckpointed for its two consumers (output + day
    agg); same for days."""
    from telemetry_parquet_spark.queries.registry import dec

    ev = load_table(spark, sf_dir, "events")
    hours = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).alias("total_dec"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .localCheckpoint()
    )
    def roll(src: DataFrame, unit: str) -> DataFrame:
        return src.groupBy(
            "event_type", F.date_trunc(unit, "bucket_ts").alias("bucket_ts")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_dec").alias("total_dec"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    days = roll(hours, "day").localCheckpoint()
    weeks = roll(days, "week")
    def label(src: DataFrame, g: str) -> DataFrame:
        return src.select(
            F.lit(g).alias("granularity"),
            "event_type",
            "bucket_ts",
            "n_events",
            F.col("total_dec").cast("double").alias("total"),
            "vmin",
            "vmax",
        )
    return label(hours, "hour").unionByName(label(days, "day")).unionByName(
        label(weeks, "week")
    )
