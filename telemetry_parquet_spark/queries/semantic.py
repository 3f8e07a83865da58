"""SemDeDup semantic-dedup query (datapipe/semantic.py) with an exact
keep/drop-labeling oracle: DuckDB re-derives the seed set, the cell
assignment (rounded-cosine argmax, lowest-seed tiebreak), the within-cell
prune pairs, and the final labels from the same table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from telemetry_parquet_spark.datapipe.semantic import semantic_prune
from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table

N_SEEDS = 8
THRESHOLD = 0.35


@query(
    "dd_semantic_prune",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS sid, CAST(embedding AS DOUBLE[]) AS sv
      FROM embeddings WHERE vec_id < {N_SEEDS}
    ),
    sp AS (
      SELECT e.vec_id, s.sid,
             UNNEST(CAST(e.embedding AS DOUBLE[])) AS a, UNNEST(s.sv) AS b
      FROM embeddings e, seeds s
    ),
    scored AS (
      SELECT vec_id, sid,
             round(SUM(a*b) / (sqrt(SUM(a*a)) * sqrt(SUM(b*b))), 6) AS score
      FROM sp GROUP BY 1, 2
    ),
    cells AS (
      SELECT vec_id, sid AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY score DESC, sid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    cv AS (
      SELECT c.vec_id, c.cell, CAST(e.embedding AS DOUBLE[]) AS v
      FROM cells c JOIN embeddings e USING (vec_id)
    ),
    pp AS (
      SELECT y.vec_id AS id_b, UNNEST(x.v) AS a, UNNEST(y.v) AS b,
             x.vec_id AS id_a
      FROM cv x JOIN cv y ON x.cell = y.cell AND x.vec_id < y.vec_id
    ),
    sims AS (
      SELECT id_b,
             round(SUM(a*b) / (sqrt(SUM(a*a)) * sqrt(SUM(b*b))), 6) AS cs
      FROM pp GROUP BY id_b, id_a
    ),
    pruned AS (SELECT DISTINCT id_b FROM sims WHERE cs >= {THRESHOLD!r})
    SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
           (p.id_b IS NULL) AS kept
    FROM cells c LEFT JOIN pruned p ON c.vec_id = p.id_b
    """,
)
def dd_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: cluster-pruned near-dup removal
    whose compare count is within-cell only — the shape that makes semantic
    dedup feasible at 100 TB (never all-pairs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_prune(emb, n_seeds=N_SEEDS, threshold=THRESHOLD)
