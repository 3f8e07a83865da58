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


# Co-purchase graph shared by graph_triangle_count and graph_label_prop:
# parts co-occurring in >= 2 distinct orders (see graph_triangle_count's
# docstring for the derivation-shape argument).
_COPURCHASE_EDGES_SQL = """
    op AS (
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
    )
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return pairs.where(F.col("w") >= 2).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )


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

    return triangle_counts(_copurchase_edges(spark, sf_dir))


@query(
    "graph_label_prop",
    oracle="""
    WITH RECURSIVE
    """ + _COPURCHASE_EDGES_SQL + """
    , both_dir AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL
      SELECT b AS u, a AS v FROM edges
    ), nodes AS (
      SELECT DISTINCT u AS id FROM both_dir
    ), lp(iter, id, lbl) AS (
      SELECT 0, id, id FROM nodes
      UNION ALL
      SELECT iter + 1, v,
             CAST(2147483647
                  - MAX(cnt * 2147483648 + (2147483647 - lbl)) % 2147483648
                  AS BIGINT)
      FROM (
        SELECT p.iter, b.v, p.lbl, COUNT(*) AS cnt
        FROM lp p JOIN both_dir b ON b.u = p.id
        WHERE p.iter < 4
        GROUP BY 1, 2, 3
      )
      GROUP BY iter, v
    )
    SELECT id AS node_id, lbl AS community FROM lp WHERE iter = 4
    """,
)
def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four synchronous label-propagation iterations over the co-purchase
    graph — deterministic communities via the integer-packed
    (max-count, min-label) argmax (operators/graph_metrics.py). The THIRD
    iterative algorithm carrying a byte-exact recursive-CTE oracle, after
    fixed-point PageRank and BPE: integer votes + arithmetic tie-breaks
    leave nothing for task ordering or float summation to perturb."""
    from telemetry_parquet_spark.operators.graph_metrics import label_propagation

    return label_propagation(_copurchase_edges(spark, sf_dir), iters=4)
