"""Exactly-once multi-table streaming ingestion
(streaming/pipelines.py::stream_commit_catalog_txn / catalog_txn_batch):
each micro-batch fans into several cataloged tables under ONE catalog
commit, and crash-replay at any window resumes without duplicating a
row."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.catalog import Catalog
from telemetry_parquet_spark.streaming.pipelines import (
    catalog_txn_batch,
    stream_commit_catalog_txn,
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(str(tmp_path / "cat"))
    c.create_table(
        spark, "evens",
        spark.createDataFrame([], "k int, x double"),
    )
    c.create_table(
        spark, "odds",
        spark.createDataFrame([], "k int, x double"),
    )
    return c


ROUTES = {
    "evens": lambda df: df.where(F.col("k") % 2 == 0),
    "odds": lambda df: df.where(F.col("k") % 2 == 1),
}


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 1.0).alias("x"),
    )


def test_stream_fans_batches_into_consistent_catalog_versions(
    spark, cat, tmp_path
):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    _batch(spark, 0, 10).write.mode("append").parquet(landing)
    stream_commit_catalog_txn(spark, landing, cat, ROUTES, ckpt)
    v1 = cat.catalog_version()
    assert cat.read(spark, "evens", v1).count() == 5
    assert cat.read(spark, "odds", v1).count() == 5
    # second relay with NEW files = a second micro-batch
    _batch(spark, 10, 16).write.mode("append").parquet(landing)
    stream_commit_catalog_txn(spark, landing, cat, ROUTES, ckpt)
    v2 = cat.catalog_version()
    assert v2 == v1 + 1
    assert cat.read(spark, "evens", v2).count() == 8
    assert cat.read(spark, "odds", v2).count() == 8
    # per-batch time travel: v1's world is intact
    assert cat.read(spark, "evens", v1).count() == 5
    # a drained relay (no new files) commits NOTHING anywhere
    heads = (
        S.latest_version(cat.table_root("evens")),
        S.latest_version(cat.table_root("odds")),
    )
    stream_commit_catalog_txn(spark, landing, cat, ROUTES, ckpt)
    assert cat.catalog_version() == v2
    assert (
        S.latest_version(cat.table_root("evens")),
        S.latest_version(cat.table_root("odds")),
    ) == heads


def test_sink_survives_catalog_vacuum(spark, cat):
    """Retention must not wedge the stream: after vacuum expires old
    catalog versions (a non-contiguous log), the next batch's replay
    scan skips the gaps and commits normally."""
    tag = "vac-stream"
    for b in range(3):
        assert catalog_txn_batch(
            spark, cat, ROUTES, tag, _batch(spark, 10 * b, 10 * b + 4), b
        )
    cat.vacuum(keep_last_catalog=1, keep_last_table=10)
    assert catalog_txn_batch(
        spark, cat, ROUTES, tag, _batch(spark, 100, 104), 3
    ) is True
    # and a replay of the surviving stamped batch is still recognized
    assert catalog_txn_batch(
        spark, cat, ROUTES, tag, _batch(spark, 100, 104), 3
    ) is False


def test_batch_replay_is_recognized_at_every_crash_window(spark, cat):
    tag = "test-stream"
    df = _batch(spark, 0, 10)

    # full run commits
    assert catalog_txn_batch(spark, cat, ROUTES, tag, df, 0) is True
    # replay after the catalog commit: level-1 stamp, nothing happens
    assert catalog_txn_batch(spark, cat, ROUTES, tag, df, 0) is False
    assert cat.read(spark, "evens").count() == 5

    # crash window A: one table staged, nothing published, no catalog
    # commit — the staged manifest is adopted by the replay
    import hashlib

    short = hashlib.md5(tag.encode()).hexdigest()[:8]
    nxt = _batch(spark, 10, 14)
    S.stage_append(
        spark, cat.table_root("evens"),
        ROUTES["evens"](nxt), f"ctxn-{short}-b1-evens",
    )
    assert catalog_txn_batch(spark, cat, ROUTES, tag, nxt, 1) is True
    assert cat.read(spark, "evens").count() == 7   # 5 + {10, 12}: no dup
    assert cat.read(spark, "odds").count() == 7    # 5 + {11, 13}

    # crash window B: one table fully published with the stamp, the
    # other untouched, no catalog commit — replay publishes only the
    # missing table, then commits the catalog
    nxt2 = _batch(spark, 14, 18)
    wap = f"ctxn-{short}-b2-odds"
    S.stage_append(spark, cat.table_root("odds"), ROUTES["odds"](nxt2), wap)
    S.publish_staged(
        spark, cat.table_root("odds"), wap,
        extra={"batch_id": 2, "stream": tag},
    )
    v_before = cat.catalog_version()
    assert catalog_txn_batch(spark, cat, ROUTES, tag, nxt2, 2) is True
    assert cat.catalog_version() == v_before + 1
    assert cat.read(spark, "odds").count() == 9    # {15, 17} ONCE
    assert cat.read(spark, "evens").count() == 9   # {14, 16}
    latest = cat.catalog_version()
    for t in ("evens", "odds"):
        ks = [r.k for r in cat.read(spark, t, latest).collect()]
        assert len(ks) == len(set(ks))  # no duplicates anywhere
