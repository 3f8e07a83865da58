"""Entity-resolution queries: blocked fuzzy matching (datapipe/entity.py)
under exact DuckDB oracles — levenshtein is a shared built-in, so the whole
block→verify→cluster pipeline replays bit-identically cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table

# Blocking key: all but the last 2 name characters. TPC-H-ish names are
# 'Customer#%09d', so a block fixes the first 7 id digits and holds ≤ 100
# records — Σ|block|²/2 grows LINEARLY with the table (block size constant),
# the property a 100 TB blocking key must have. Pairs differing inside the
# blocked prefix are never compared — the standard ER recall trade,
# documented; the oracle replays the same key, so the gate checks the
# decided semantics.
_BLK_LEN = 16
_MAX_DIST = 1


@query(
    "er_fuzzy_customer_pairs",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey AS id, c_name AS name,
             substr(c_name, 1, {_BLK_LEN}) AS blk
      FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist
    FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
    WHERE levenshtein(a.name, b.name) BETWEEN 1 AND {_MAX_DIST}
    """,
)
def er_fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record matching: equality self-join on the truncated
    name (hash-partitioned on the block key — NEVER all-pairs), then a
    codegen ``levenshtein`` verify at distance ≤ {_MAX_DIST}. The fuzzy
    sibling of the exact-key joins the reference stops at (device renames,
    typo'd ids, vendor drift)."""
    from telemetry_parquet_spark.datapipe.entity import er_blocked_fuzzy_pairs

    cust = load_table(spark, sf_dir, "customer")
    return er_blocked_fuzzy_pairs(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block=F.substring("c_name", 1, _BLK_LEN),
        max_dist=_MAX_DIST,
        prefix_len=_BLK_LEN,  # prefix blocking: DP runs on the suffixes
    ).select(
        "id_a", "id_b", F.col("dist").cast("int").alias("dist")
    )


@query(
    "er_entity_groups",
    oracle=f"""
    WITH RECURSIVE c AS (
      SELECT c_custkey AS id, c_name AS name,
             substr(c_name, 1, {_BLK_LEN}) AS blk
      FROM customer
    ), pairsq AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
      WHERE levenshtein(a.name, b.name) BETWEEN 1 AND {_MAX_DIST}
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairsq
      UNION
      SELECT id_b AS a, id_a AS b FROM pairsq
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), comp AS (
      SELECT a AS id, least(a, MIN(b)) AS component FROM reach GROUP BY a
    )
    SELECT CAST(COALESCE(comp.component, c.id) AS BIGINT) AS entity_id,
           CAST(c.id AS BIGINT) AS member_id
    FROM c LEFT JOIN comp ON c.id = comp.id
    """,
)
def er_entity_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified fuzzy pairs collapsed into match groups by min-label
    connected components, singletons kept as their own entity — the
    dedupe→survivorship input. Transitive chains inside a block merge
    (dist-1 neighbors chain through shared digits), which is exactly why
    ER pipelines need explicit survivorship rules downstream; the oracle
    is the recursive-CTE transitive closure of the same pair graph."""
    from telemetry_parquet_spark.datapipe.entity import (
        er_blocked_fuzzy_pairs,
        er_match_groups,
    )

    cust = load_table(spark, sf_dir, "customer")
    pairs = er_blocked_fuzzy_pairs(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block=F.substring("c_name", 1, _BLK_LEN),
        max_dist=_MAX_DIST,
        prefix_len=_BLK_LEN,  # prefix blocking: DP runs on the suffixes
    )
    return er_match_groups(pairs, cust, id_col="c_custkey").select(
        F.col("entity_id").cast("bigint").alias("entity_id"),
        F.col("member_id").cast("bigint").alias("member_id"),
    )
