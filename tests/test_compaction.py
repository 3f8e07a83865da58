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
