"""Connected-components cluster resolution tests."""

from __future__ import annotations

from telemetry_parquet_spark.datapipe.clusters import (
    connected_components,
    resolve_duplicate_clusters,
)


def test_connected_components_chain_and_islands(spark):
    # components: {1,2,3,4 (chain)}, {10,11}, {20,21,22 (star)}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
        ["id_a", "id_b"],
    )
    comp = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_resolve_duplicate_clusters(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in [1, 2, 3, 4, 10, 11, 50]], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    out = resolve_duplicate_clusters(docs, pairs)
    assert sorted(r.doc_id for r in out.collect()) == [1, 10, 50]
