"""Bloom file-skipping index tests (sources/skipping.py): pruning
effectiveness, the no-false-negative contract over many probes, absent-key
fast path, and fingerprint reuse of the materialized layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources.skipping import (
    bloom_candidate_files,
    build_file_bloom_index,
    ensure_split_dataset,
    pruned_point_lookup,
)

N_FILES = 16


@pytest.fixture(scope="module")
def dataset(spark, sf_dir):
    src = os.path.join(sf_dir, "orders.parquet")
    path = ensure_split_dataset(
        spark, src, "skip_test_orders", layout_col="o_orderdate",
        n_files=N_FILES,
    )
    return path


@pytest.fixture(scope="module")
def index(spark, dataset):
    return build_file_bloom_index(
        spark.read.parquet(dataset), "o_custkey"
    ).cache()


def test_dataset_split_into_files(spark, dataset):
    n = (
        spark.read.parquet(dataset)
        .select("_metadata.file_path")
        .distinct()
        .count()
    )
    assert n == N_FILES


def test_no_false_negatives_and_pruning(spark, dataset, index):
    """Every one of 25 sampled custkeys: the pruned lookup returns exactly
    the full-scan rows, and across the sample at least some probes skip
    files (a custkey's orders touch only a few date-range files)."""
    df = spark.read.parquet(dataset)
    keys = [
        r.o_custkey
        for r in df.select("o_custkey").distinct().orderBy("o_custkey").limit(25).collect()
    ]
    pruned_any = False
    for k in keys:
        cands = bloom_candidate_files(index, k)
        pruned_any = pruned_any or len(cands) < N_FILES
        got = pruned_point_lookup(spark, dataset, index, "o_custkey", k)
        want = df.where(F.col("o_custkey") == k)
        assert got.exceptAll(want).union(want.exceptAll(got)).count() == 0, k
    assert pruned_any


def test_absent_key_prunes_everything_or_fp_only(spark, dataset, index):
    """A key outside the domain: candidates are FP-only (well under the
    file count at the default sizing) and the lookup returns zero rows."""
    absent = -987654321
    cands = bloom_candidate_files(index, absent)
    assert len(cands) < N_FILES
    assert pruned_point_lookup(
        spark, dataset, index, "o_custkey", absent
    ).count() == 0


def test_fingerprint_reuse(spark, sf_dir, dataset):
    """Second ensure on the same source returns the same path without
    rewriting (mtime of the fingerprint file unchanged)."""
    meta = os.path.join(dataset, "_FINGERPRINT.json")
    before = os.stat(meta).st_mtime_ns
    again = ensure_split_dataset(
        spark, os.path.join(sf_dir, "orders.parquet"),
        "skip_test_orders", layout_col="o_orderdate", n_files=N_FILES,
    )
    assert again == dataset
    assert os.stat(meta).st_mtime_ns == before


def test_index_merges_by_bit_or(spark, dataset, index):
    """Per-file bitmaps built on two halves of the file set, unioned and
    re-bit_or'ed, equal the index built in one pass — the append/merge
    contract (bit_or is associative/commutative/idempotent)."""
    files = sorted(
        r.file_path
        for r in spark.read.parquet(dataset)
        .select("_metadata.file_path")
        .distinct()
        .collect()
    )
    half_a, half_b = files[: len(files) // 2], files[len(files) // 2:]
    part_a = build_file_bloom_index(spark.read.parquet(*half_a), "o_custkey")
    part_b = build_file_bloom_index(spark.read.parquet(*half_b), "o_custkey")
    merged = (
        part_a.union(part_b)
        .groupBy("file_path", "word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert merged.exceptAll(index).union(index.exceptAll(merged)).count() == 0


def test_incremental_index_equals_full_rebuild(spark, sf_dir, tmp_path):
    """File-lifecycle maintenance: build the index on the initial files,
    append more files to the table, update incrementally — the updated
    index must equal a from-scratch rebuild row for row, and the update
    must not rescan covered files (it reads only the NEW paths)."""
    from telemetry_parquet_spark.sources.skipping import (
        update_file_bloom_index,
    )

    path = str(tmp_path / "orders_growing")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    first, second = (
        orders.where(F.col("o_orderkey") % 3 != 0),
        orders.where(F.col("o_orderkey") % 3 == 0),
    )
    first.repartition(6).write.mode("overwrite").parquet(path)
    idx0 = update_file_bloom_index(spark, path, None, "o_custkey")
    n0 = idx0.select("file_path").distinct().count()
    idx0 = idx0.localCheckpoint()  # pin pre-append bitmaps

    second.repartition(4).write.mode("append").parquet(path)
    idx1 = update_file_bloom_index(spark, path, idx0, "o_custkey")
    full = update_file_bloom_index(spark, path, None, "o_custkey")
    assert idx1.exceptAll(full).union(full.exceptAll(idx1)).count() == 0
    assert idx1.select("file_path").distinct().count() > n0

    # no new files -> the same frame comes back untouched
    idx2 = update_file_bloom_index(spark, path, idx1, "o_custkey")
    assert idx2 is idx1

    # the updated index serves exact pruned lookups over the grown table
    probe = orders.agg(F.min("o_custkey")).first()[0]
    got = pruned_point_lookup(spark, path, idx1, "o_custkey", probe)
    want = spark.read.parquet(path).where(F.col("o_custkey") == probe)
    assert got.exceptAll(want).union(want.exceptAll(got)).count() == 0


def test_bloom_probe_matches_spark_string_form(spark, tmp_path):
    """The probe must hash the SPARK cast-to-string representation: a
    Python str() mismatch (True vs 'true', 5 vs '5.0') is a Bloom FALSE
    NEGATIVE — silently missing rows."""
    from telemetry_parquet_spark.sources.skipping import (
        bloom_candidate_files,
        bloom_candidate_files_any,
        build_file_bloom_index,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(True, 5.0), (False, 7.5)], "flag boolean, amt double"
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    for col, present, absent in (
        ("flag", True, None),
        ("amt", 5.0, 9.25),
    ):
        idx = build_file_bloom_index(df, col)
        assert bloom_candidate_files(idx, present), (col, present)
        if absent is not None:
            assert not bloom_candidate_files(idx, absent)
    idx = build_file_bloom_index(df, "amt")
    assert bloom_candidate_files_any(idx, [5.0, 123.0])
    assert bloom_candidate_files_any(idx, []) == []  # IN () = nothing


def test_plan_scan_keeps_files_the_bloom_index_never_saw(spark, tmp_path):
    """Stale Bloom coverage must be exactness-safe: files appended after
    the last index update are KEPT unconditionally (the min/max rule),
    never silently dropped."""
    from telemetry_parquet_spark.sources.scan_planner import Eq, plan_scan
    from telemetry_parquet_spark.sources.skipping import (
        build_file_bloom_index,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k int, s string").coalesce(
        1
    ).write.parquet(path)
    idx = build_file_bloom_index(spark.read.parquet(path), "k")
    idx = spark.createDataFrame(idx.collect(), idx.schema)  # freeze
    # a file the index never saw, holding the probed key
    spark.createDataFrame([(42, "late")], "k int, s string").coalesce(
        1
    ).write.mode("append").parquet(path)
    df, plan = plan_scan(
        spark, path, [Eq("k", 42)], bloom_indexes={"k": idx}
    )
    assert [r.s for r in df.collect()] == ["late"]  # not silently lost
