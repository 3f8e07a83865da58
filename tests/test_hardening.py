"""Regression tests for the adversarial-review hardening of the commit
path (snapshots.py): type-checked commits, DV-aware and empty-batch-safe
unique probes, merge-time unique enforcement, crash-idempotent publish,
tag-name validation, vacuum orphan grace, overwrite tombstone release."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 1.0).alias("x"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    S.append(spark, root, _df(spark, 0, 10))
    return root


def test_type_mismatched_batch_is_rejected_not_committed(spark, table):
    bad = spark.range(3).select(
        (F.col("id") * 1.0).alias("k"),  # double vs table's int
        (F.col("id") * 1.0).alias("x"),
    )
    head = S.latest_version(table)
    for op, call in (
        ("append", lambda: S.append(spark, table, bad)),
        ("stage_append", lambda: S.stage_append(spark, table, bad, "w1")),
        ("merge_into", lambda: S.merge_into(spark, table, bad, ["k"])),
    ):
        with pytest.raises(ValueError, match="type mismatch"):
            call()
    assert S.latest_version(table) == head        # nothing committed
    S.read_snapshot(spark, table).count()         # head still readable


def test_empty_batch_append_to_unique_keyed_table(spark, table):
    S.add_unique_constraint(spark, table, "pk", ["k"])
    empty = spark.createDataFrame([], "k int, x double")
    v = S.append(spark, table, empty)  # crashed with TypeError before
    assert S.read_snapshot(spark, table, v).count() == 10


def test_unique_probe_sees_through_deletion_vectors(spark, table):
    S.add_unique_constraint(spark, table, "pk", ["k"])
    S.delete_where_mor(spark, table, "k = 7")
    # k=7 is logically absent: re-inserting it must be legal
    v = S.append(
        spark, table,
        spark.createDataFrame([(7, 70.0)], "k int, x double"),
    )
    got = {r.k: r.x for r in S.read_snapshot(spark, table, v).collect()}
    assert got[7] == 70.0 and len(got) == 10
    # and a REAL collision is still caught
    with pytest.raises(ValueError, match="collide"):
        S.append(
            spark, table,
            spark.createDataFrame([(3, 0.0)], "k int, x double"),
        )


def test_merge_into_enforces_unique_keys(spark, table):
    S.add_unique_constraint(spark, table, "pk", ["k"])
    # merge keyed on x (not the unique key): source inserts k=3, which
    # collides with a carried row — append would reject this, and now
    # merge does too
    src = spark.createDataFrame([(3, 999.0)], "k int, x double")
    with pytest.raises(ValueError, match="pk"):
        S.merge_into(spark, table, src, keys=["x"])
    # a legitimate upsert keyed ON the unique key still works
    v = S.merge_into(spark, table, src, keys=["k"])
    got = {r.k: r.x for r in S.read_snapshot(spark, table, v).collect()}
    assert got[3] == 999.0 and len(got) == 10


def test_publish_retry_after_crash_window_is_exactly_once(spark, table):
    S.stage_append(spark, table, _df(spark, 100, 105), "crashpub")
    staged_path = S._staged_path(table, "crashpub")
    saved = open(staged_path).read()
    v = S.publish_staged(spark, table, "crashpub")
    # simulate a crash BETWEEN the commit and the manifest removal
    with open(staged_path, "w") as f:
        f.write(saved)
    v2 = S.publish_staged(spark, table, "crashpub")  # the retry
    assert v2 == v                                   # same version back
    assert not os.path.exists(staged_path)           # stage consumed
    assert S.latest_version(table) == v               # no second commit
    assert S.read_snapshot(spark, table).count() == 15  # rows ONCE


def test_tag_names_with_path_separators_are_rejected(spark, table):
    for bad in ("../evil", "a/b", "", ".hidden"):
        with pytest.raises(ValueError, match="invalid tag name"):
            S.create_tag(table, bad)
    assert not os.path.exists(os.path.join(table, "evil.json"))


def test_vacuum_spares_young_orphans(spark, table, tmp_path):
    # plant an unreferenced (in-flight-writer-shaped) parquet file
    orphan_dir = os.path.join(table, "data", "c000099-deadbeef")
    _df(spark, 0, 3).coalesce(1).write.parquet(orphan_dir)
    removed = S.vacuum(table, keep_last=1)  # default grace: kept
    assert not any("c000099" in r for r in removed)
    removed = S.vacuum(table, keep_last=1, orphan_grace_s=0.0)
    assert any("c000099" in r for r in removed)
    assert not (
        os.path.exists(orphan_dir)
        and any(n.endswith(".parquet") for n in os.listdir(orphan_dir))
    )  # no data bytes remain (Spark's _SUCCESS marker may linger)


def test_overwrite_releases_drop_column_tombstone(spark, table):
    S.alter_drop_column(table, "x")
    with pytest.raises(ValueError, match="compact"):
        S.alter_add_column(table, "x", "double")
    S.overwrite(
        spark, table, spark.createDataFrame([(1,)], "k int")
    )  # full replace: no old bytes remain
    v = S.alter_add_column(table, "x", "double")  # now legal
    assert "x" in S.read_snapshot(spark, table, v).columns


def test_compact_dataset_restores_crash_residue_and_skips_null_partitions(
    spark, tmp_path
):
    """A crash between the swap renames leaves only .compact-old — the
    next run must RESTORE it (deleting it was data loss). Null/escaped
    partition values don't round-trip the equality filter; they are
    skipped, never replaced with an empty rewrite."""
    import os
    import shutil

    from telemetry_parquet_spark.sources.writers import (
        compact_dataset,
        read_dataset,
    )

    path = str(tmp_path / "ds")
    spark.createDataFrame(
        [("20240101", 1), ("20240101", 2), (None, 3)], "d string, v int"
    ).write.partitionBy("d").parquet(path)
    # simulate the crash window: live dir gone, .old holds the data
    live = os.path.join(path, "d=20240101")
    old = os.path.join(path, ".compact-old-d=20240101")
    os.rename(live, old)
    sizes = compact_dataset(spark, path, ["d"])
    assert os.path.isdir(live) and not os.path.exists(old)  # restored
    got = sorted(r.v for r in read_dataset(spark, path).collect())
    assert got == [1, 2, 3]  # nothing lost
    assert sizes.get("__HIVE_DEFAULT_PARTITION__") == -1  # skipped, loud


def test_write_partitioned_does_not_leak_session_conf(spark, tmp_path):
    from telemetry_parquet_spark.sources.writers import write_partitioned

    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    try:
        write_partitioned(
            spark.createDataFrame([("20240101", 1)], "d string, v int"),
            str(tmp_path / "o"),
            ["d"],
        )
        assert spark.conf.get(key) == "static"  # restored
    finally:
        spark.conf.unset(key)
