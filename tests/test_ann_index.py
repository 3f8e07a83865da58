"""Persisted IVF index table (datapipe/ann_index.py): build layout,
frozen-quantizer incremental appends, partition-pruned probes, and
equivalence of the appended index with a frozen-assign rebuild."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.ann_index import (
    append_vectors,
    build_ivf_table,
    ivf_table_topk,
    load_centroids,
)
from telemetry_parquet_spark.ml.kmeans_det import (
    _matmul_assign_udf,
    quantize_vectors,
)
from telemetry_parquet_spark.sources.tables import load_table

K, ITERS = 64, 2


def _qvec(spark, sf_dir):
    return quantize_vectors(load_table(spark, sf_dir, "embeddings"))


@pytest.fixture()
def index(spark, sf_dir, tmp_path):
    root = str(tmp_path / "ivfidx")
    qvec = _qvec(spark, sf_dir)
    build_ivf_table(
        spark, root, qvec.where(F.col("vec_id") % 10 != 9), k=K, iters=ITERS
    )
    return root


def test_build_layout_and_centroid_contract(spark, sf_dir, index):
    # postings live in per-cell directories; centroids are <= k rows
    cents = load_centroids(spark, index)
    assert 1 < len(cents) <= K
    dirs = {
        d
        for d in os.listdir(os.path.join(index, "postings"))
        if d.startswith("cluster_id=")
    }
    assert {int(d.split("=")[1]) for d in dirs} <= {c for c, _ in cents}
    # every training vector is in exactly one cell
    n_train = (
        _qvec(spark, sf_dir).where(F.col("vec_id") % 10 != 9).count()
    )
    posts = spark.read.parquet(os.path.join(index, "postings"))
    assert posts.count() == n_train
    assert posts.select("vec_id").distinct().count() == n_train


def test_append_routes_by_frozen_centroids(spark, sf_dir, index):
    qvec = _qvec(spark, sf_dir)
    hold = qvec.where(F.col("vec_id") % 10 == 9)
    append_vectors(spark, index, hold, k=K)
    posts = spark.read.parquet(os.path.join(index, "postings"))
    assert posts.count() == qvec.count()
    # appended rows sit in the cell the frozen quantizer assigns
    cents = load_centroids(spark, index)
    expected = hold.select(
        "vec_id", _matmul_assign_udf(cents, K)(F.col("qv")).alias("cid")
    )
    got = posts.join(hold.select("vec_id"), "vec_id").select(
        "vec_id", F.col("cluster_id").cast("long").alias("cid")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_probe_reads_only_probed_cells(spark, sf_dir, index):
    qvec = _qvec(spark, sf_dir)
    queries = qvec.where(F.col("vec_id") < 3)
    out = ivf_table_topk(
        spark, index, queries, k=K, nprobe=2, topk=5, require_pruned=True
    )
    rows = out.collect()
    assert 0 < len(rows) <= 3 * 5
    # rank is dense from 1 per query and scores are non-increasing
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score_q for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_index_build_and_append_deterministic(spark, sf_dir, index, tmp_path):
    """The whole build+append pipeline is replayable: a second build
    from the same data yields byte-identical logical content (the
    property the recursive-CTE oracle of sim_ivf_persisted_topk relies
    on)."""
    qvec = _qvec(spark, sf_dir)
    append_vectors(
        spark, index, qvec.where(F.col("vec_id") % 10 == 9), k=K
    )
    root2 = str(tmp_path / "ivfidx2")
    build_ivf_table(
        spark, root2, qvec.where(F.col("vec_id") % 10 != 9), k=K,
        iters=ITERS,
    )
    append_vectors(
        spark, root2, qvec.where(F.col("vec_id") % 10 == 9), k=K
    )
    assert load_centroids(spark, index) == load_centroids(spark, root2)

    def content(root):
        return sorted(
            map(
                tuple,
                spark.read.parquet(os.path.join(root, "postings"))
                .select(
                    "vec_id", F.col("cluster_id").cast("long")
                )
                .collect(),
            )
        )

    assert content(index) == content(root2)


def test_dedup_append_is_idempotent(spark, sf_dir, index):
    qvec = _qvec(spark, sf_dir)
    hold = qvec.where(F.col("vec_id") % 10 == 9)
    append_vectors(spark, index, hold, k=K, dedup=True)
    n1 = spark.read.parquet(os.path.join(index, "postings")).count()
    # replayed batch: identical rows must vanish in the anti-join
    append_vectors(spark, index, hold, k=K, dedup=True)
    n2 = spark.read.parquet(os.path.join(index, "postings")).count()
    assert n1 == n2 == qvec.count()


def test_stream_index_vectors_matches_batch(spark, sf_dir, index, tmp_path):
    """availableNow streaming maintenance == batch append: two landing-
    zone drops drain into the index and the final content equals the
    batch-appended twin (frozen quantizer, idempotent routing)."""
    from telemetry_parquet_spark.datapipe.ann_index import (
        stream_index_vectors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    emb.where(F.col("vec_id") % 10 == 9).where(
        F.col("vec_id") % 20 == 9
    ).write.mode("append").parquet(landing)
    stream_index_vectors(spark, landing, index, ckpt, k=K)
    emb.where(F.col("vec_id") % 10 == 9).where(
        F.col("vec_id") % 20 != 9
    ).write.mode("append").parquet(landing)
    stream_index_vectors(spark, landing, index, ckpt, k=K)
    got = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(index, "postings"))
            .select("vec_id", F.col("cluster_id").cast("long"))
            .collect(),
        )
    )
    qvec = _qvec(spark, sf_dir)
    cents = load_centroids(spark, index)
    want_hold = qvec.where(F.col("vec_id") % 10 == 9).select(
        "vec_id", _matmul_assign_udf(cents, K)(F.col("qv")).alias("cid")
    )
    want = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(index, "postings"))
            .where(~F.col("vec_id").isin(
                [int(r.vec_id) for r in want_hold.select("vec_id").collect()]
            ))
            .select("vec_id", F.col("cluster_id").cast("long"))
            .union(want_hold)
            .collect(),
        )
    )
    assert got == want


def test_compact_index_preserves_content(spark, sf_dir, index):
    from telemetry_parquet_spark.datapipe.ann_index import compact_index

    qvec = _qvec(spark, sf_dir)
    hold = qvec.where(F.col("vec_id") % 10 == 9)
    # several small appends -> file fragmentation
    for m in (9, 19):
        append_vectors(
            spark, index, hold.where(F.col("vec_id") % 20 == m), k=K
        )

    def content():
        return sorted(
            map(
                tuple,
                spark.read.parquet(os.path.join(index, "postings"))
                .select("vec_id", F.col("cluster_id").cast("long"))
                .collect(),
            )
        )

    before_rows = content()
    n_before, n_after = compact_index(spark, index)
    assert n_after < n_before
    # one file per cell
    posts_dir = os.path.join(index, "postings")
    cells = [d for d in os.listdir(posts_dir) if d.startswith("cluster_id=")]
    assert n_after == len(cells)
    assert content() == before_rows
    # probes still work on the compacted layout
    out = ivf_table_topk(
        spark, index, qvec.where(F.col("vec_id") < 2), k=K, nprobe=2,
        topk=5, require_pruned=True,
    )
    assert out.count() > 0
