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


@query(
    "graph_personalized_pagerank",
    oracle="""
    WITH RECURSIVE
    base AS (
      SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                      CAST(l_partkey + 1000000 AS BIGINT) AS p
      FROM lineitem
    ),
    edges AS (
      SELECT s AS src, p AS dst FROM base
      UNION ALL
      SELECT p AS src, s AS dst FROM base
    ),
    nodes AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
      )
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    aug AS (
      SELECT e.src, e.dst, d.d, TRUE AS is_real
      FROM edges e JOIN deg d USING (src)
      UNION ALL
      SELECT id, id, 1, FALSE FROM nodes
    ),
    seed_cnt AS (SELECT COUNT(*) AS ns FROM nodes WHERE id % 7 = 0),
    pr(iter, id, rank_s) AS (
      SELECT 0, id,
             CAST(CASE WHEN id % 7 = 0
                       THEN 1000000000000 // (SELECT ns FROM seed_cnt)
                       ELSE 0 END AS BIGINT)
      FROM nodes
      UNION ALL
      SELECT p.iter + 1, a.dst,
             CAST(CASE WHEN a.dst % 7 = 0
                       THEN ((1000000000000 // (SELECT ns FROM seed_cnt))
                             * 15) // 100
                       ELSE 0 END
                  + (SUM(CASE WHEN a.is_real THEN p.rank_s // a.d ELSE 0 END)
                     * 85) // 100
                  AS BIGINT)
      FROM pr p JOIN aug a ON a.src = p.id
      WHERE p.iter < 5
      GROUP BY p.iter, a.dst
    )
    SELECT id AS node_id, rank_s FROM pr WHERE iter = 5
    """,
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the supplier↔part graph: teleport mass
    flows only to the seed set (node id % 7 == 0) and ranks start uniform
    over the seeds, so scores measure proximity TO THE SEEDS — the
    recommendation/affinity variant of ``graph_pagerank``. Identical
    scaled-integer recurrence ⇒ identical byte-exact recursive-CTE oracle
    discipline (see operators/pagerank.py::seed_mod)."""
    from telemetry_parquet_spark.operators.pagerank import pagerank_fixed_point

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_suppkey").cast("long").alias("s"),
        (F.col("l_partkey") + 1000000).cast("long").alias("p"),
    ).distinct()
    edges = base.select(F.col("s").alias("src"), F.col("p").alias("dst")).unionByName(
        base.select(F.col("p").alias("src"), F.col("s").alias("dst"))
    )
    ranks = pagerank_fixed_point(edges, iters=5, seed_mod=7)
    return ranks.select(F.col("id").alias("node_id"), "rank_s")
