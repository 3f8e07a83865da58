"""Late round-9 table-service completions: metadata-only DROP COLUMN
with tombstones, region-scoped compaction, and time-based vacuum
retention."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.scan_planner import Range


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 2).alias("x"),
    )


def test_drop_column_is_metadata_only_and_tombstoned(spark, tmp_path):
    root = str(tmp_path / "dc")
    S.append(spark, root, _df(spark, 0, 40))
    files_before = set(S.read_manifest(root, 1)["files"])
    v = S.alter_drop_column(root, "x")
    m = S.read_manifest(root, v)
    assert set(m["files"]) == files_before  # no data rewritten
    got = S.read_snapshot(spark, root)
    assert got.columns == ["k", "g"]
    assert got.count() == 40
    # time travel still sees the column at v1
    assert "x" in S.read_snapshot(spark, root, 1).columns
    # re-adding the same name refuses until a full rewrite
    with pytest.raises(ValueError, match="previously dropped"):
        S.alter_add_column(root, "x", "string")
    S.compact_table(spark, root, target_bytes=64 * 1024 * 1024)
    S.alter_add_column(root, "x", "string")  # tombstone cleared
    assert S.read_snapshot(spark, root).where("x IS NULL").count() == 40


def test_drop_column_refuses_constrained_columns(spark, tmp_path):
    root = str(tmp_path / "dc2")
    S.append(spark, root, _df(spark, 0, 10))
    S.add_check_constraint(spark, root, "pos_x", "x >= 0")
    S.add_unique_constraint(spark, root, "pk", ["k"])
    with pytest.raises(ValueError, match="CHECK constraint 'pos_x'"):
        S.alter_drop_column(root, "x")
    with pytest.raises(ValueError, match="UNIQUE key 'pk'"):
        S.alter_drop_column(root, "k")
    S.drop_check_constraint(root, "pos_x")
    S.alter_drop_column(root, "x")  # now fine


def test_compact_where_rewrites_only_the_region(spark, tmp_path):
    root = str(tmp_path / "cw")
    # range layout on k: 10 files, each ~100 keys wide, multiple small
    # files inside the low region via per-range repartition
    low = _df(spark, 0, 200).repartition(6)
    high = _df(spark, 200, 1000).repartitionByRange(8, "k")
    S.append(spark, root, low)
    S.append(spark, root, high)
    m1 = S.read_manifest(root, S.latest_version(root))
    before = S.read_snapshot(spark, root)
    rows_before = sorted(map(tuple, before.collect()))
    v = S.compact_where(
        spark, root, [Range("k", 0, 199)], target_bytes=64 * 1024 * 1024
    )
    m2 = S.read_manifest(root, v)
    # the high-region files carried by reference
    high_files = [
        f for f in m1["files"]
        if m1["stats"][f]["k"][0] >= 200
    ]
    assert set(high_files) <= set(m2["files"])
    assert m2["region_files"] >= 6  # the 6 low-region files rewrote
    assert len(m2["files"]) < len(m1["files"])
    after = sorted(map(tuple, S.read_snapshot(spark, root).collect()))
    assert after == rows_before  # pure re-layout


def test_vacuum_retain_since_keeps_recent_versions(spark, tmp_path):
    root = str(tmp_path / "vt")
    S.append(spark, root, _df(spark, 0, 10))
    S.overwrite(spark, root, _df(spark, 10, 20))
    cutoff = time.time()
    S.overwrite(spark, root, _df(spark, 20, 30))
    S.overwrite(spark, root, _df(spark, 30, 40))
    removed = S.vacuum(root, keep_last=1, retain_since=cutoff)
    # versions committed after the cutoff all stay readable
    assert S.read_snapshot(spark, root, 3).count() == 10
    assert S.read_snapshot(spark, root, 4).count() == 10
    # the pre-cutoff overwrite's files went
    assert removed
    with pytest.raises(FileNotFoundError):
        S.read_manifest(root, 2)


def test_sql_drop_column_and_vacuum_hours(spark, tmp_path):
    from telemetry_parquet_spark.sources.sql_front import engine_sql

    root = str(tmp_path / "sql2")
    S.append(spark, root, _df(spark, 0, 10))
    t = {"t": root}
    r = engine_sql(spark, "ALTER TABLE t DROP COLUMN x", tables=t)
    assert r.first().action == "drop-column:x"
    assert S.read_snapshot(spark, root).columns == ["k", "g"]
    S.overwrite(spark, root, S.read_snapshot(spark, root).limit(5))
    r = engine_sql(spark, "VACUUM t RETAIN 1 HOURS", tables=t).first()
    assert r.action == "vacuum:0_files"  # everything is <1h old: kept
    assert S.read_snapshot(spark, root, 1).count() == 10


def test_concurrent_appenders_stress_no_lost_commits(spark, tmp_path):
    """8 threads race appends through commit_with_retry against one
    table: every batch must land exactly once (no lost update, no
    double-commit) and the version chain must be gap-free — the
    optimistic-concurrency contract under real contention, not just the
    single-conflict unit test."""
    import threading

    root = str(tmp_path / "race")
    S.append(spark, root, _df(spark, 0, 10))
    N = 8
    errors = []

    def writer(i: int) -> None:
        lo = 1000 * (i + 1)
        try:
            S.commit_with_retry(
                lambda: S.append(spark, root, _df(spark, lo, lo + 10)),
                retries=N,
            )
        except Exception as e:  # surfaces in the main thread's assert
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(N)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    head = S.latest_version(root)
    assert head == 1 + N  # gap-free chain: create+first append + N races
    got = S.read_snapshot(spark, root)
    assert got.count() == 10 + 10 * N
    # every thread's batch present exactly once
    for i in range(N):
        lo = 1000 * (i + 1)
        assert got.where(f"k >= {lo} AND k < {lo + 10}").count() == 10
    # parents form a chain (each manifest's parent is version-1)
    for v in range(1, head + 1):
        assert S.read_manifest(root, v)["parent"] == v - 1


def test_concurrent_mixed_mutators_converge(spark, tmp_path):
    """Appends and merge-on-read deletes racing through commit_with_retry:
    order of interleaving must not matter — the delete predicates match
    only the initial rows and the appended key ranges never match them,
    so the final logical content is deterministic no matter who wins
    which version slot. Exercises the retry path where a MOR delete
    recomputes its deletion vector against a head that moved under it."""
    import threading

    root = str(tmp_path / "mixed")
    S.append(spark, root, _df(spark, 0, 10))
    errors = []

    def run(fn, i):
        try:
            S.commit_with_retry(fn, retries=12)
        except Exception as e:
            errors.append((i, repr(e)))

    jobs = [
        lambda lo=1000 * (i + 1): S.append(spark, root, _df(spark, lo, lo + 10))
        for i in range(4)
    ] + [
        lambda: S.delete_where_mor(spark, root, "k < 3"),
        lambda: S.delete_where_mor(spark, root, "k >= 3 AND k < 6"),
    ]
    threads = [
        threading.Thread(target=run, args=(fn, i))
        for i, fn in enumerate(jobs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    head = S.latest_version(root)
    assert head == 1 + len(jobs)  # every mutator committed exactly once
    for v in range(1, head + 1):
        assert S.read_manifest(root, v)["parent"] == v - 1
    got = sorted(r.k for r in S.read_snapshot(spark, root).select("k").collect())
    want = sorted(
        list(range(6, 10))
        + [k for i in range(4) for k in range(1000 * (i + 1), 1000 * (i + 1) + 10)]
    )
    assert got == want
