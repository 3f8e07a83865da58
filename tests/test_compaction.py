"""Compaction tests (sources/compaction.py): plan determinism and size
bounds, row preservation through the rewrite, and the point of the whole
exercise — fewer files out than in."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources.compaction import (
    compact,
    compaction_plan,
    file_manifest,
)

N_FILES = 16


@pytest.fixture(scope="module")
def small_files(spark, sf_dir, tmp_path_factory):
    """lineitem shattered into 16 small files — the pathological sink
    output compaction exists for."""
    out = str(tmp_path_factory.mktemp("frag") / "lineitem_frag")
    (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .repartition(N_FILES)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_manifest_covers_every_file(spark, small_files):
    m = file_manifest(spark, small_files).collect()
    assert len(m) == N_FILES
    total_rows = sum(r.n_rows for r in m)
    assert total_rows == spark.read.parquet(small_files).count()
    assert all(r.file_size > 0 for r in m)


def test_plan_is_deterministic_and_bounded(spark, small_files):
    m = file_manifest(spark, small_files)
    total = m.agg(F.sum("file_size")).first()[0]
    target = total // 4
    p1 = sorted(compaction_plan(m, target).collect())
    p2 = sorted(compaction_plan(m, target).collect())
    assert p1 == p2
    # group ids are dense-ish and bounded: bytes-before/target for the
    # last file is < total/target, so at most ceil(total/target)+1 groups
    groups = {r.group_id for r in p1}
    assert len(groups) <= total // target + 2
    # next-fit invariant: bytes BEFORE each group's first file lie in
    # [group_id * target, (group_id+1) * target)
    by_path = sorted(p1, key=lambda r: r.file_path)
    running = 0
    for r in by_path:
        assert r.group_id == running // target
        running += r.file_size


def test_compact_preserves_rows_and_reduces_files(spark, small_files, tmp_path):
    out = str(tmp_path / "compacted")
    m = file_manifest(spark, small_files)
    total = m.agg(F.sum("file_size")).first()[0]
    compact(spark, small_files, out, target_bytes=total // 4)
    src = spark.read.parquet(small_files)
    dst = spark.read.parquet(out).drop("group_id")
    assert dst.count() == src.count()
    assert (
        dst.select(sorted(dst.columns))
        .exceptAll(src.select(sorted(src.columns)))
        .count()
        == 0
    )
    n_out = (
        spark.read.parquet(out)
        .select("_metadata.file_path")
        .distinct()
        .count()
    )
    assert n_out < N_FILES
    assert n_out <= total // (total // 4) + 2


def test_streaming_landing_maintenance_loop(spark, sf_dir, tmp_path):
    """The full lifecycle: two availableNow micro-batch relays append
    small files into a landing zone, then a maintenance pass compacts it
    — the row multiset survives both hops (source → landing → compacted)
    and the file count drops. This is the 'compact closed partitions as
    data lands' loop a 100 TB streaming table needs."""
    from telemetry_parquet_spark.sources.compaction import (
        file_manifest,
        maintenance_pass,
        read_compacted,
    )
    from telemetry_parquet_spark.streaming.pipelines import (
        stream_append_parquet,
    )

    src = str(tmp_path / "src")
    landing = str(tmp_path / "landing")
    compacted = str(tmp_path / "compacted")
    ckpt = str(tmp_path / "ckpt")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    first = orders.where(F.col("o_orderkey") % 2 == 0)
    second = orders.where(F.col("o_orderkey") % 2 != 0)

    # batch 1 lands, relay drains it; batch 2 lands, relay drains ONLY it
    first.repartition(5).write.mode("overwrite").parquet(src)
    stream_append_parquet(spark, src, landing, ckpt)
    n_after_first = file_manifest(spark, landing).count()
    second.repartition(5).write.mode("append").parquet(src)
    stream_append_parquet(spark, src, landing, ckpt)
    n_after_second = file_manifest(spark, landing).count()
    assert n_after_second > n_after_first  # second relay appended files

    landed = spark.read.parquet(landing)
    assert landed.count() == orders.count()

    stats = maintenance_pass(spark, landing, compacted, target_bytes=1 << 30)
    assert stats["compacted"] and stats["n_files"] == n_after_second
    assert stats["n_groups"] < n_after_second  # fewer files afterwards

    got = read_compacted(spark, compacted)
    assert got.schema == landed.schema
    assert got.exceptAll(landed).union(landed.exceptAll(got)).count() == 0

    # an idle cycle (nothing new, below min_files) declines to rewrite
    empty_landing = str(tmp_path / "noop")
    first.limit(1).write.parquet(empty_landing)
    noop = maintenance_pass(
        spark, empty_landing, str(tmp_path / "noop_out"),
        target_bytes=1 << 30, min_files=2,
    )
    assert noop == {"compacted": False, "n_files": 1, "n_groups": 0}
