"""Longitudinal-view queries — the reference's downstream consumer shape
(``docs/longitudinal_examples.md``): one row per client holding parallel
arrays ordered newest-first, queried by array indexing and parallel UNNEST.

These run the A6 CollectList machinery (null-retaining co-sorted collect,
``CollectList.scala:15-166``) end-to-end under the correctness gate: build
the per-user arrays with the operator, then zip/unnest them back to rows and
compare against the window-function oracle — if the co-sort ever drifted
between columns, the (idx, ts, type, value) tuples would mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table


def _longitudinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user longitudinal row: parallel arrays (ts/type/value) ordered
    newest-first, built with the A6 collect-sort machinery."""
    from telemetry_parquet_spark.operators.topk import collect_top_k_per_group

    events = load_table(spark, sf_dir, "events")
    collected = collect_top_k_per_group(
        events,
        keys=["user_id"],
        order_cols=[("ts", True), ("event_id", True)],
        payload_cols=["event_type", "value"],
        k=1_000_000,
        out_col="items",
    )
    return collected.select(
        "user_id",
        F.transform("items", lambda x: x["ts"]).alias("ts_arr"),
        F.transform("items", lambda x: x["event_type"]).alias("type_arr"),
        F.transform("items", lambda x: x["value"]).alias("value_arr"),
    )


@query(
    "longitudinal_unnest",
    oracle="""
    SELECT user_id,
           CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS INT)
             AS idx,
           ts, event_type, value
    FROM events
    """,
)
def longitudinal_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build per-user parallel arrays (A6), then parallel-UNNEST them back
    (arrays_zip + posexplode — Presto's CROSS JOIN UNNEST(a, b) analog).
    idx is 1-based, newest first, exactly the consumer docs' contract."""
    lon = _longitudinal(spark, sf_dir)
    zipped = lon.select(
        "user_id",
        F.posexplode(F.arrays_zip("ts_arr", "type_arr", "value_arr")).alias(
            "pos", "z"
        ),
    )
    return zipped.select(
        "user_id",
        (F.col("pos") + 1).cast("int").alias("idx"),
        F.col("z.ts_arr").alias("ts"),
        F.col("z.type_arr").alias("event_type"),
        F.col("z.value_arr").alias("value"),
    )


@query(
    "longitudinal_newest",
    oracle="""
    SELECT user_id, event_type AS newest_type, value AS newest_value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def longitudinal_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array indexing on the longitudinal row: ``arr[1]`` = the newest
    submission (1-based, docs/longitudinal_examples.md)."""
    lon = _longitudinal(spark, sf_dir)
    return lon.select(
        "user_id",
        F.element_at("type_arr", 1).alias("newest_type"),
        F.element_at("value_arr", 1).alias("newest_value"),
    )
