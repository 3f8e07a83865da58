"""Embedding-cosine near-duplicate detection (the semantic-dedup family of
the LLM-pipeline brief).

- ``embedding_cosine_pairs_exact``: all pairs with cosine ≥ threshold —
  inherently O(N²); exists as the verification/oracle baseline and for
  small blocked sets. At scale, block first (by label, cluster, or LSH).
- ``embedding_near_dup_pairs``: the scale path — hyperplane-LSH signature
  blocking (equal 2^bits-bucket join) followed by exact cosine verification.
  Recall trades with ``bits`` exactly as in similarity search; near-dup
  vectors (cosine → 1) almost always share the full signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.similarity import (
    _hyperplanes,
    cosine_presplit,
    lsh_signature,
    norm,
)


def embedding_cosine_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine pairs ≥ threshold (id_a < id_b). Quadratic — the compare
    count is N²/2; use only on blocked subsets or as the oracle baseline."""
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine_presplit(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """LSH-blocked near-dup pairs: equal-signature bucket join (shuffle key =
    the 2^bits signature — compare count drops by ~2^bits) + exact cosine
    verification ≥ threshold."""
    planes = _hyperplanes(dim, bits, seed)
    signed = emb.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("__n"),
        lsh_signature(F.col(vec_col), planes).alias("__sig"),
    )
    left = signed.alias("l")
    right = signed.alias("r")
    return (
        left.join(
            right,
            (F.col("l.__sig") == F.col("r.__sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(
                cosine_presplit(
                    F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"),
                    F.col("l.__n"), F.col("r.__n"),
                ),
                6,
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
