"""Deterministic k-means library tests (ml/kmeans_det.py) — the properties
the recursive-CTE oracle can't express directly: partition totality,
run-to-run determinism, inertia improvement over the seed assignment, and
the k/iters parameter surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.ml.kmeans_det import (
    kmeans_centroid_table,
    kmeans_fit,
    quantize_vectors,
)
from telemetry_parquet_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def qvec(spark, sf_dir):
    return quantize_vectors(load_table(spark, sf_dir, "embeddings")).cache()


def test_assignment_partitions_corpus(spark, qvec):
    n = qvec.count()
    assigned, centroids = kmeans_fit(qvec, k=8, iters=3)
    rows = assigned.collect()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n
    assert {r.cluster_id for r in rows} <= set(range(8))
    assert 1 <= len(centroids) <= 8
    assert all(len(vec) == 64 for _, vec in centroids)


def test_deterministic_rerun(spark, qvec):
    a1, c1 = kmeans_fit(qvec, k=4, iters=2)
    a2, c2 = kmeans_fit(qvec, k=4, iters=2)
    assert c1 == c2
    assert a1.exceptAll(a2).union(a2.exceptAll(a1)).count() == 0


def test_iterations_do_not_worsen_inertia(spark, qvec):
    """Total within-cluster distance after 4 iterations must not exceed the
    1-iteration (seed-assignment) inertia. Integer-rounded centroid updates
    perturb exact Lloyd monotonicity by at most half a quantum per
    component, far below the improvement the first real update makes."""

    def inertia(iters: int) -> int:
        assigned, _ = kmeans_fit(qvec, k=8, iters=iters)
        cent = kmeans_centroid_table(assigned, qvec)
        pts = assigned.join(qvec, "vec_id").select(
            "cluster_id", F.posexplode("qv").alias("dim0", "qval")
        ).withColumn("dim_idx", (F.col("dim0") + 1).cast("int"))
        return (
            pts.join(cent, ["cluster_id", "dim_idx"])
            .select(
                ((F.col("qval") - F.col("centroid_q"))
                 * (F.col("qval") - F.col("centroid_q"))).alias("d2")
            )
            .agg(F.sum("d2").alias("s"))
            .collect()[0]
            .s
        )

    assert inertia(4) <= inertia(1)


def test_centroid_table_matches_fit_centroids(spark, qvec):
    """kmeans_centroid_table over the final assignment reproduces the fit's
    own returned centroid vectors component for component."""
    assigned, centroids = kmeans_fit(qvec, k=8, iters=2)
    table = {
        (r.cluster_id, r.dim_idx): r.centroid_q
        for r in kmeans_centroid_table(assigned, qvec).collect()
    }
    for cid, vec in centroids:
        for d, v in enumerate(vec, start=1):
            assert table[(cid, d)] == v
