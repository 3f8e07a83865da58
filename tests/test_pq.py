"""Product quantization (datapipe/pq.py): encode semantics, compression
contract, ADC quality bound, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.pq import adc_top_k, pq_encode, sub_centroids


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from telemetry_parquet_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_codes_shape_and_range(emb):
    n = emb.count()
    codes = pq_encode(emb, m=8, k=16)
    assert codes.count() == n * 8  # M codes per vector
    bad = codes.where((F.col("code") < 0) | (F.col("code") >= 16)).count()
    assert bad == 0


def test_seed_vectors_encode_to_themselves(emb):
    """Seed c's subvector IS centroid (j, c), distance 0 — so every seed
    encodes to its own id in every subspace (ties cannot beat dist 0 with
    a lower c unless two seeds share a subvector)."""
    codes = pq_encode(emb, m=8, k=16).where(F.col("vec_id") < 16)
    mismatched = codes.where(F.col("code") != F.col("vec_id")).count()
    assert mismatched == 0


def test_adc_recall_against_exact(emb):
    """ADC top-10 must overlap the exact L2 top-10 substantially — the
    quality contract that makes the compression usable (PQ is approximate;
    with 16 seed centroids per subspace on 500 vectors we still expect the
    identical top match and majority overlap)."""
    from telemetry_parquet_spark.datapipe.pq import l2sq

    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    q = F.array(*[F.lit(x) for x in qv])
    exact = [
        r.vec_id
        for r in emb.select(
            "vec_id", F.round(l2sq(F.col("embedding"), q), 6).alias("d")
        )
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    ]
    approx = [r.vec_id for r in adc_top_k(emb, qv, top=10, m=8, k=16).collect()]
    assert approx[0] == 0 == exact[0]  # the query vector itself
    # seed codebooks (not KMeans-trained) bound what recall this config
    # can reach; the contract here is "meaningfully better than random"
    # (random 10-of-500 overlap ≈ 0.2 ids) with the top match exact
    assert len(set(approx) & set(exact)) >= 3


def test_encode_no_python_and_broadcast(emb):
    plan = pq_encode(emb, m=8, k=16)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_subcentroids_cover_all_subspaces(emb):
    cents = sub_centroids(emb, m=8, k=16).collect()
    assert len(cents) == 8 * 16
    assert all(len(r.sub) == 8 for r in cents)
