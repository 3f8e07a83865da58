"""Window functions, dedup-by-rank, sessionization (SURVEY.md §2.5, A1, O3).

The reference has exactly one window function (W1 row_number latest-per-key,
``AddonRecommender.scala:123-130``); the rest of the ranking/analytic/frame
surface is engine-completeness required by its downstream consumers
(``docs/longitudinal_examples.md``). Sessionization is the batch analog of
streaming session windows (§2.10 net-new surface).

Determinism: every window ORDER BY ends in a unique key (event_id/orderkey)
so row_number/lag/cumulative results are total-ordered on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import dec, query
from telemetry_parquet_spark.sources.tables import load_table


@query(
    "w1_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def w1_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number latest-per-key (AddonRecommender.scala:123-130)."""
    from telemetry_parquet_spark.operators.dedup import latest_per_key

    orders = load_table(spark, sf_dir, "orders")
    return latest_per_key(
        orders,
        keys=["o_custkey"],
        order=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


@query(
    "a1_earliest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC) = 1
    """,
)
def a1_earliest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: argmin group-reduce, earliest-wins
    (PioneerOnlineNewsDedupe.scala:119-121) via min_by over a total order."""
    from telemetry_parquet_spark.operators.dedup import earliest_per_key

    events = load_table(spark, sf_dir, "events")
    return earliest_per_key(
        events, keys=["user_id"], order_cols=["ts", "event_id"]
    ).select("user_id", "event_id", "ts", "event_type")


@query(
    "w2_running_order_total",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_total,
      row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        AS order_seq
    FROM orders
    """,
)
def w2_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-frame cumulative aggregate + ranking (net-new frame surface)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "w3_event_gaps",
    oracle="""
    SELECT
      user_id,
      event_id,
      CAST(date_diff('second',
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
        ts) AS BIGINT) AS gap_seconds,
      lead(event_type) OVER (
        PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_event_type
    FROM events
    """,
)
def w3_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead (net-new; no counterpart in reference, §2.5)."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return events.select(
        "user_id",
        "event_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_seconds"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "o3_top_events_per_user",
    oracle="""
    SELECT user_id, event_id, value,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
      FROM events
    ) WHERE rnk <= 3
    """,
)
def o3_top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: per-group ordered trim (CollectList.scala:56-160 semantics,
    expressed as rank-and-filter instead of a collect-sort-slice UDAF)."""
    from telemetry_parquet_spark.operators.topk import top_k_per_group

    events = load_table(spark, sf_dir, "events")
    return top_k_per_group(
        events,
        keys=["user_id"],
        order=[F.col("value").desc(), F.col("event_id").asc()],
        k=3,
        rank_col="rnk",
    ).select("user_id", "event_id", "value", "rnk")


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
               OR date_diff('second', lag(ts) OVER w, ts) > 1800
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessions AS (
      SELECT user_id, ts, value,
        CAST(SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY ts ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag → cumulative session id → per-session
    agg (30 min gap). Batch analog of streaming session_window (§2.10)."""
    from telemetry_parquet_spark.operators.sessionize import sessionize

    events = load_table(spark, sf_dir, "events")
    sess = sessionize(
        events,
        key="user_id",
        ts_col="ts",
        gap_seconds=1800,
        order_tiebreak="event_id",
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(dec("value")).cast("double").alias("session_value"),
    )
