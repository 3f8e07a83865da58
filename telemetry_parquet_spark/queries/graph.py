"""Graph-metric queries over derived co-occurrence graphs.

Companion to the PageRank family in ``queries/corpus.py`` — same derived
graphs, different metric. Triangle counting is the canonical "is my join
shape skew-safe" graph benchmark: the naive wedge enumeration is Σ deg²
and dies on hot nodes; the degree-oriented algorithm
(``operators/graph_metrics.py``) is O(m^1.5) worst-case regardless of
skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table


@query(
    "graph_triangle_count",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e0 AS (
      SELECT CAST(x.l_partkey AS BIGINT) AS a,
             CAST(y.l_partkey AS BIGINT) AS b,
             COUNT(*) AS w
      FROM op x JOIN op y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
    ), edges AS (
      SELECT a, b FROM e0 WHERE w >= 2
    ), tri AS (
      SELECT e1.a AS u, e1.b AS v, e2.b AS w
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.b
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT node_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (
      SELECT u AS node_id FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri
    )
    GROUP BY node_id
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the frequently-co-purchased graph
    (parts co-occurring in ≥ 2 distinct orders).

    Edge derivation: one order-keyed self-join of the DISTINCT (order,
    part) projection — pair instances are Σ|basket|²/2, never catalog²
    (the ``basket_part_pairs`` shape) — then a co-occurrence-count filter
    that keeps the graph sparse. Triangles come from the degree-oriented
    wedge join (see operators/graph_metrics.py for the O(m^1.5) argument).

    The oracle enumerates triangles the textbook way (a<b<c three-way
    self-join); orientation changes which apex EMITS each triangle but not
    the triangle set, so per-node counts agree exactly."""
    from telemetry_parquet_spark.operators.graph_metrics import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    x = op.alias("x")
    y = op.alias("y")
    pairs = (
        x.join(y, "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").cast("long").alias("a"),
            F.col("y.l_partkey").cast("long").alias("b"),
        )
        .agg(F.count("*").alias("w"))
    )
    edges = pairs.where(F.col("w") >= 2).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    return triangle_counts(edges)
