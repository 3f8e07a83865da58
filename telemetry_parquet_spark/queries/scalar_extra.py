"""Remaining scalar/grouping oracle coverage: F10 histogram bucketing,
GROUPING SETS, F11 block-id distribution (crc32 exists in both engines? —
DuckDB lacks crc32, so block ids are checked bitwise against zlib in pytest;
here the bucketed query carries F10 into the gate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import dec, query
from telemetry_parquet_spark.sources.tables import load_table


@query(
    "f10_bucketed_histogram",
    oracle="""
    SELECT
      CAST(CASE WHEN value <= 50 THEN 50
                WHEN value <= 100 THEN 100
                WHEN value <= 200 THEN 200
                ELSE 201 END AS INT) AS bucket,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY 1
    """,
)
def f10_bucketed_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 `bucketed` (udfs.scala:17-19) as a when-chain expression driving a
    histogram aggregation — first split >= value, else max+1."""
    from telemetry_parquet_spark.functions.hashing import bucketed

    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            bucketed("value", [50, 100, 200]).cast("int").alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total"),
        )
    )


@query(
    "grouping_sets_volume",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (net-new; completes rollup/cube/sets trio)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )
