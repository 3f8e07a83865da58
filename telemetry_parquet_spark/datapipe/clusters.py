"""Duplicate-cluster resolution: connected components over near-dup pairs.

Pair generators (MinHash/SimHash/ngram-Jaccard) emit edges; choosing ONE
survivor per duplicate group needs the connected components of that graph —
a chain a~b~c must collapse to a single keeper even though (a,c) was never
emitted as a pair.

Algorithm: iterative min-label propagation (the standard large-graph CC on
Spark): every node starts labeled with itself; each round, a node adopts the
minimum label in its neighborhood; converged when no label changes. Rounds
= graph diameter (near-dup clusters are shallow — a handful of rounds).
Each round is one shuffle (groupBy node); lineage is truncated with
localCheckpoint per round (Y4, the same discipline the reference applied to
ALS) so the plan doesn't grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id_a, id_b) undirected edges → (doc_id, component) where component
    is the minimum node id in the connected component."""
    edges = (
        pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
        .unionByName(pairs.select(F.col(id_b).alias("s"), F.col(id_a).alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_labels = (
            edges.join(labels, edges.d == labels.node)
            .select(F.col("s").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), "component")


def resolve_duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Keep one survivor per duplicate component (min id) plus all documents
    that appear in no pair — the final dedup selection step."""
    comp = connected_components(pairs)
    keepers = comp.groupBy("component").agg(F.min("doc_id").alias(id_col))
    in_pairs = comp.select(F.col("doc_id").alias(id_col))
    survivors_in_clusters = docs.join(
        keepers.select(id_col), on=id_col, how="left_semi"
    )
    untouched = docs.join(in_pairs, on=id_col, how="left_anti")
    return untouched.unionByName(survivors_in_clusters)
