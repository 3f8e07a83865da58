"""Core relational layer (SURVEY.md §2.2-§2.7) on the TPC-H-ish tables.

Each query is the Spark-first expression of an inventory row (P/J/A/W/O/U ids
cited per query, with the reference file:line the semantics come from).
DuckDB oracle SQL sits alongside; see registry docstring for the determinism
rules (decimal-cast sums, total tie-break orders, BIGINT casts for DuckDB's
HUGEINT sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import dec, query
from telemetry_parquet_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations (A4/A8 analog surface; TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with multiple measures (A8; Q1 shape).

    Map-side partial aggregation is automatic for these native aggregates
    (the reference's UDAF update/merge contract, AggMapSum.scala:38-54, got
    the same effect without codegen).
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec(disc_price, 18, 4)).cast("double").alias("sum_disc_price"),
            # charge = price*(1-disc)*(1+tax) carries up to 6 true decimals
            # (all inputs are 2-decimal); cast at scale 6 so neither engine
            # rounds at a representable half-boundary.
            F.sum(dec(charge, 24, 6)).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(dec("l_discount", 18, 4)).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l_orderkey,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (J3 broadcast dims, O2 top-k).

    customer is the small side — broadcast it so the orders/lineitem join is
    the only shuffle (at 100 TB customer-by-segment still fits broadcast
    thresholds after the filter; AQE would pick this anyway at runtime).
    """
    cutoff = F.lit("1997-06-01 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 4))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT
      n_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join star query: broadcast every dimension, shuffle only facts."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 4))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "a8_counts_per_nation",
    oracle="""
    SELECT
      n_name,
      COUNT(*) AS n_customers,
      COUNT(DISTINCT c_mktsegment) AS n_segments,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
      MIN(c_acctbal) AS min_acctbal,
      MAX(c_acctbal) AS max_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def a8_counts_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row/distinct counts + min/max (A8, DatasetComparator.scala:126-135)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_acctbal"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
        )
    )


@query(
    "a9_null_counts",
    oracle="""
    SELECT
      CAST(SUM(CAST(event_id IS NULL AS INT)) AS BIGINT) AS event_id,
      CAST(SUM(CAST(ts IS NULL AS INT)) AS BIGINT) AS ts,
      CAST(SUM(CAST(user_id IS NULL AS INT)) AS BIGINT) AS user_id,
      CAST(SUM(CAST(event_type IS NULL AS INT)) AS BIGINT) AS event_type,
      CAST(SUM(CAST(value IS NULL AS INT)) AS BIGINT) AS value,
      CAST(SUM(CAST(props IS NULL AS INT)) AS BIGINT) AS props
    FROM events
    """,
)
def a9_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-column null counts (A9, DatasetComparator.scala:113-123)."""
    from telemetry_parquet_spark.operators.compare import null_counts

    return null_counts(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Joins (J1-J3)
# ---------------------------------------------------------------------------


@query(
    "j1_anti_orders_without_lineitems",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def j1_anti_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti equi join (J1, PioneerOnlineNewsDedupe.scala:114-117)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_totalprice")


@query(
    "j2_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE c_acctbal > 1000
      AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j2_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join == EXISTS (J3's allowlist-membership shape,
    AddonRecommender.scala:132-148, done as a distributed semi join)."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 1000)
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "j3_broadcast_enrich",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def j3_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim broadcast join (J3): no shuffle for the join itself,
    a single shuffle for the aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations (U1-U2)
# ---------------------------------------------------------------------------


@query(
    "u1_union_by_name",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, 'high_balance' AS cohort
    FROM customer WHERE c_acctbal >= 9000
    UNION ALL
    SELECT c_custkey AS custkey, c_name AS name, 'machinery' AS cohort
    FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName (U1, PioneerOnlineNewsDedupe.scala:99-105 — name-based
    is the safe successor of the reference's positional typed union)."""
    cust = _t(spark, sf_dir, "customer")
    high = cust.where(F.col("c_acctbal") >= 9000).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.lit("high_balance").alias("cohort"),
    )
    mach = cust.where(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.lit("machinery").alias("cohort"),
    )
    return high.unionByName(mach)


@query(
    "u2_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey AS custkey FROM customer
    """,
)
def u2_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (U2, DatasetComparator.scala:138-146): an order
    custkey appearing k times survives k-1 times after subtracting the
    customer list once — the multiset (ALL) semantics, not set difference."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    ordered = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return ordered.exceptAll(cust)


@query(
    "u3_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersect — absent from the reference (SURVEY §2.7), engine-complete here."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


# ---------------------------------------------------------------------------
# Projections / filters (P1-P8) + scalar functions (F20-F22)
# ---------------------------------------------------------------------------


@query(
    "p2_dynamic_predicates",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_totalprice >= 50000
      AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
    """,
)
def p2_dynamic_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized conjunctive predicate fold (P2+P3, DatasetShim.scala:52-57)
    — built with Column expressions, not string interpolation."""
    from functools import reduce

    preds = [
        F.col("o_orderstatus") == F.lit("F"),
        F.col("o_totalprice") >= F.lit(50000),
        F.col("o_orderdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"),
    ]
    orders = _t(spark, sf_dir, "orders")
    return orders.where(reduce(lambda a, b: a & b, preds)).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "p7_column_expressions",
    oracle="""
    SELECT
      p_partkey,
      p_retailprice / 5 AS fifth_price,
      CAST(p_size * 2 AS INT) AS double_size,
      upper(p_brand) AS brand_upper
    FROM part WHERE p_size >= 25
    """,
)
def p7_column_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived column definitions (P7 ColumnEnumeration.scala:20-55,
    F20-F21 arithmetic/cast-in-expression)."""
    part = _t(spark, sf_dir, "part")
    return part.where(F.col("p_size") >= 25).select(
        "p_partkey",
        (F.col("p_retailprice") / 5).alias("fifth_price"),
        (F.col("p_size") * 2).cast("int").alias("double_size"),
        F.upper("p_brand").alias("brand_upper"),
    )
