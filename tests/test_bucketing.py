"""Bucketed co-located join: the join on the bucket key must plan with NO
shuffle exchange on either side."""

from __future__ import annotations

from pyspark.sql import functions as F

from telemetry_parquet_spark.plans.explain import exchange_count, formatted_plan
from telemetry_parquet_spark.sources.tables import load_table
from telemetry_parquet_spark.sources.writers import write_bucketed_table


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    write_bucketed_table(
        orders.select("o_orderkey", "o_totalprice"),
        "orders_b", ["o_orderkey"], num_buckets=8,
    )
    write_bucketed_table(li, "lineitem_b", ["l_orderkey"], num_buckets=8)

    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    joined = a.join(b, a.o_orderkey == b.l_orderkey).groupBy("o_orderkey").agg(
        F.count("*").alias("n"),
        F.sum("l_quantity").alias("q"),
    )
    # sort-merge join reads both sides bucket-aligned; the groupBy reuses the
    # same partitioning: zero shuffle exchanges in the whole plan
    assert exchange_count(joined) == 0, formatted_plan(joined)[:2000]

    # results match the unbucketed plan
    direct = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, direct.collect()))

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
