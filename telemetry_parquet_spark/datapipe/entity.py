"""Entity resolution: blocked fuzzy record matching.

The classic record-linkage shape (Fellegi–Sunter blocking + string-distance
verify): candidate pairs come from an equality self-join on a cheap BLOCKING
KEY (truncated name, phonetic code, sorted-token prefix …), then an edit
distance verifies real matches. The reference repo stops at exact-key joins;
this adds the fuzzy sibling every telemetry/CRM pipeline eventually needs
(device renames, typo'd client ids, vendor name drift).

100 TB shape:
- NEVER all-pairs: the only join is hash-partitioned on the block key, so
  cost is Σ|block|²/2, bounded by the blocking design (the same argument as
  the LSH band join in datapipe/dedup.py — blocking IS the application-level
  LSH). Block-size skew is observable up front with operators/skew.py's
  pre-flight; a hot block is a blocking-key-design bug, not a shuffle bug.
- ``levenshtein`` runs as a JVM codegen expression on the joined pairs — no
  Python anywhere.
- Recall is the standard blocking trade: pairs whose difference falls INSIDE
  the blocking key are never compared (document the key choice per dataset).
  Both engines replay the same blocking, so the exact oracle checks the
  decided semantics, not a lucky corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def er_blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_dist: int = 1,
    prefix_len: int | None = None,
) -> DataFrame:
    """(id_a, id_b, dist): unordered candidate pairs from an equality
    self-join on ``block`` whose ``levenshtein(name_a, name_b)`` is within
    ``max_dist`` (0 < dist — exact duplicates belong to exact dedup).

    ``block`` is any deterministic Column over the record (truncated name,
    soundex-style code, zip+birth-year …); it is evaluated once per side.

    ``prefix_len``: when the blocking key IS ``substring(name, 1,
    prefix_len)`` (prefix blocking), pass it — joined pairs then share
    their first ``prefix_len`` characters by construction, and edit
    distance is invariant under common-prefix removal, so the DP runs on
    the short suffixes only (cells ∝ (len − prefix_len)·max_dist instead
    of len·max_dist). The reported ``dist`` is UNCHANGED — the exact
    oracle still states full-string levenshtein, proving the lemma held.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        block.alias("__blk"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        block.alias("__blk"),
    )
    return (
        a.join(b, "__blk")
        .where(F.col("id_a") < F.col("id_b"))
        # |len(a) − len(b)| is a levenshtein LOWER bound: pairs beyond it
        # can never match, and the length filter is a codegen'd integer
        # compare — prunes most of the Σ|block|² pairs before any DP runs
        .where(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
        )
        # thresholded levenshtein (Spark 3.5+) early-exits the DP once the
        # running distance exceeds max_dist (returns -1, filtered below) —
        # O(max_dist·len) per surviving pair instead of O(len²); with
        # prefix blocking the DP sees only the post-prefix suffixes
        .withColumn(
            "dist",
            F.levenshtein(
                F.expr(f"substring(name_a, {prefix_len + 1})"),
                F.expr(f"substring(name_b, {prefix_len + 1})"),
                max_dist,
            )
            if prefix_len is not None
            else F.levenshtein("name_a", "name_b", max_dist),
        )
        .where((F.col("dist") > 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", "dist")
    )


def er_match_groups(
    pairs: DataFrame, ids: DataFrame, id_col: str
) -> DataFrame:
    """(entity_id, member_id): collapse verified pairs into match groups by
    min-label connected components (datapipe/clusters.py), with singletons
    kept as their own entity — the dedupe→survivorship input table."""
    from telemetry_parquet_spark.datapipe.clusters import connected_components

    cc = connected_components(pairs)  # (doc_id, component)
    return (
        ids.select(F.col(id_col).alias("member_id"))
        .join(cc, F.col("member_id") == F.col("doc_id"), "left")
        .select(
            F.coalesce(F.col("component"), F.col("member_id")).alias(
                "entity_id"
            ),
            "member_id",
        )
    )
