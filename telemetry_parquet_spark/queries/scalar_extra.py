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
    "percentile_stats",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           median(l_quantity) AS med,
           quantile_cont(l_quantity, 0.9) AS q90,
           quantile_cont(l_extendedprice, 0.5) AS med_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles/median per group — Spark `percentile`
    and DuckDB `quantile_cont` agree bit-for-bit (both linear
    interpolation); the approximate variant (`percentile_approx`) exists for
    the 100 TB path but is sketch-specific and pytest-covered instead."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.median("l_quantity").alias("med"),
        F.percentile("l_quantity", F.lit(0.9)).alias("q90"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("med_price"),
    )


@query(
    "events_flatten_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
           event_type
    FROM events
    WHERE props IS NOT NULL
    """,
)
def events_flatten_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events_flatten JSON extraction done through the VARIANT type
    (parse_json + try_variant_get) instead of get_json_object — the
    single-parse path that scales when many fields are extracted from one
    document (get_json_object re-parses per call)."""
    events = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    return events.where(F.col("props").isNotNull()).select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("prop_k"),
        "event_type",
    )


@query(
    "comparator_summary",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM customer) AS left_rows,
      (SELECT COUNT(*) FROM customer) AS right_rows,
      (SELECT COUNT(*) FROM customer
        WHERE c_mktsegment = 'BUILDING' AND c_acctbal <> -c_acctbal)
        AS left_minus_right,
      (SELECT COUNT(*) FROM customer
        WHERE c_mktsegment = 'BUILDING' AND c_acctbal <> -c_acctbal)
        AS right_minus_left,
      (SELECT CAST(SUM(CAST(c_acctbal IS NULL AS INT)) AS BIGINT)
         FROM customer) AS n_null_diff_base
    """,
)
def comparator_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DatasetComparator in the gate (DatasetComparator.scala:73-160): run
    the comparator between the customer table and a drifted copy (BUILDING
    balances negated) and emit its single-row summary — row counts,
    symmetric exceptAll diffs, null counts — exactly the reference's JSON
    result record shape (S9)."""
    from telemetry_parquet_spark.operators.compare import compare_datasets

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    drifted = cust.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_mktsegment") == "BUILDING", -F.col("c_acctbal")
        ).otherwise(F.col("c_acctbal")),
    )
    res = compare_datasets(cust, drifted, key_columns=["c_custkey", "c_acctbal"])
    return spark.createDataFrame(
        [
            (
                res.left_rows,
                res.right_rows,
                res.left_minus_right,
                res.right_minus_left,
                len(res.null_count_diffs),
            )
        ],
        "left_rows bigint, right_rows bigint, left_minus_right bigint, "
        "right_minus_left bigint, n_null_diff_base bigint",
    )


@query(
    "merge_upsert_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_mktsegment <> 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal * 2 AS c_acctbal FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO emulation (operators/merge.py): upsert a changed subset
    (BUILDING customers with doubled balances) into the customer table —
    matched rows replaced, others untouched."""
    from telemetry_parquet_spark.operators.merge import merge_upsert

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    source = cust.where(F.col("c_mktsegment") == "BUILDING").withColumn(
        "c_acctbal", F.col("c_acctbal") * 2
    )
    merged = merge_upsert(cust, source, keys=["c_custkey"])
    return merged.select("c_custkey", "c_name", "c_acctbal")


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
