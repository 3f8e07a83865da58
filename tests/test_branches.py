"""Branches on the snapshot table (sources/branches.py): isolation from
main readers, fast-forward and rebase merges, the non-commuting refusal,
constraint re-validation, and vacuum pinning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.branches import (
    branch_append,
    branch_delete_where,
    create_branch,
    delete_branch,
    list_branches,
    merge_branch,
    read_branch,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    S.append(spark, root, _df(spark, 0, 100))
    return root


def test_branch_isolated_from_main_and_vice_versa(spark, table):
    create_branch(table, "dev")
    branch_append(spark, table, "dev", _df(spark, 100, 150))
    # main readers see nothing
    assert S.read_snapshot(spark, table).count() == 100
    assert [h["action"] for h in S.history(table)] == ["create", "append"]
    # branch sees fork + its append
    assert read_branch(spark, table, "dev").count() == 150
    # a later MAIN commit is invisible to the branch
    S.append(spark, table, _df(spark, 500, 510))
    assert read_branch(spark, table, "dev").count() == 150


def test_fast_forward_merge_carries_branch_deletes(spark, table):
    create_branch(table, "dev")
    branch_append(spark, table, "dev", _df(spark, 100, 150))
    branch_delete_where(spark, table, "dev", "g = 0")
    n = read_branch(spark, table, "dev").count()
    v = merge_branch(spark, table, "dev")
    assert v == S.latest_version(table)
    assert S.read_snapshot(spark, table).count() == n
    assert S.read_snapshot(spark, table).where("g = 0").count() == 0
    # time travel still sees pre-merge main
    assert S.read_snapshot(spark, table, 1).count() == 100
    assert "dev" not in list_branches(table)


def test_rebase_merge_appends_commute_with_main(spark, table):
    create_branch(table, "dev")
    branch_append(spark, table, "dev", _df(spark, 100, 150))
    branch_append(spark, table, "dev", _df(spark, 150, 160))
    S.append(spark, table, _df(spark, 200, 220))  # main moves
    merge_branch(spark, table, "dev")
    got = S.read_snapshot(spark, table)
    assert got.count() == 100 + 50 + 10 + 20
    m = S.read_manifest(table, S.latest_version(table))
    assert m["action"] == "branch-merge" and m["rebased_from"] == 1


def test_rebase_refuses_non_append_branch(spark, table):
    create_branch(table, "dev")
    branch_delete_where(spark, table, "dev", "g = 1")
    S.append(spark, table, _df(spark, 200, 210))  # main moves
    with pytest.raises(RuntimeError, match="do not commute"):
        merge_branch(spark, table, "dev")
    # fast-forward would have been fine: re-fork proves state intact
    assert read_branch(spark, table, "dev").where("g = 1").count() == 0


def test_rebase_revalidates_current_constraints(spark, table):
    create_branch(table, "dev")
    branch_append(spark, table, "dev", _df(spark, 1000, 1010))
    # main adds a constraint the branch rows violate, then advances
    S.add_check_constraint(spark, table, "small_k", "k < 500")
    with pytest.raises(ValueError, match="small_k"):
        merge_branch(spark, table, "dev")


def test_branch_append_validates_fork_constraints_and_schema(spark, table):
    S.add_check_constraint(spark, table, "small_k", "k < 500")
    create_branch(table, "dev")
    with pytest.raises(ValueError, match="small_k"):
        branch_append(spark, table, "dev", _df(spark, 1000, 1010))
    bad = spark.range(5).select(F.col("id").alias("wrong"))
    with pytest.raises(ValueError, match="schema mismatch"):
        branch_append(spark, table, "dev", bad)


def test_vacuum_pins_branch_files_until_deleted(spark, table):
    create_branch(table, "dev")
    branch_append(spark, table, "dev", _df(spark, 100, 150))
    S.append(spark, table, _df(spark, 200, 210))
    S.append(spark, table, _df(spark, 300, 310))
    removed = S.vacuum(table, keep_last=1)
    # branch still fully readable after an aggressive vacuum
    assert read_branch(spark, table, "dev").count() == 150
    assert all("branch-dev" not in r for r in removed)
    delete_branch(table, "dev")
    # a dropped branch's files are unreferenced orphans: held through
    # the in-flight-writer grace window, reclaimed past it
    removed = S.vacuum(table, keep_last=1)
    assert all("branch-dev" not in r for r in removed)
    removed = S.vacuum(table, keep_last=1, orphan_grace_s=0.0)
    assert any("branch-dev" in r for r in removed)  # now reclaimed
    assert S.read_snapshot(spark, table).count() == 120


def test_create_branch_from_tag_and_duplicate_refused(spark, table):
    S.append(spark, table, _df(spark, 100, 120))
    S.create_tag(table, "rel", 1)
    create_branch(table, "hotfix", "rel")
    assert read_branch(spark, table, "hotfix").count() == 100
    with pytest.raises(ValueError, match="already exists"):
        create_branch(table, "hotfix")


def test_sql_front_branch_lifecycle(spark, table):
    """The branch surface through the SQL front door: CREATE/DESCRIBE/
    read-via-VERSION-AS-OF/MERGE/DROP, plus the DESCRIBE DETAIL column."""
    from telemetry_parquet_spark.sources.sql_front import engine_sql

    t = {"t": table}
    r = engine_sql(spark, "CREATE BRANCH dev ON t", tables=t).first()
    assert r.action == "create-branch:dev"
    branch_append(spark, table, "dev", _df(spark, 100, 140))

    rows = engine_sql(spark, "DESCRIBE BRANCHES t", tables=t).collect()
    assert [(x.branch, x.head, x.base_version, x.append_only) for x in rows] == [
        ("dev", 1, 1, True)
    ]
    assert engine_sql(spark, "DESCRIBE DETAIL t", tables=t).first().branches == "dev"

    n = engine_sql(
        spark,
        "SELECT COUNT(*) AS n FROM t VERSION AS OF 'branch:dev'",
        tables=t,
    ).first().n
    assert n == 140
    # branch sequence point 0 = the fork
    n0 = engine_sql(
        spark,
        "SELECT COUNT(*) AS n FROM t VERSION AS OF 'branch:dev@0'",
        tables=t,
    ).first().n
    assert n0 == 100
    # main head unaffected until merge
    assert engine_sql(spark, "SELECT COUNT(*) AS n FROM t", tables=t).first().n == 100

    r = engine_sql(spark, "MERGE BRANCH dev INTO t", tables=t).first()
    assert r.action == "merge-branch:dev" and r.version == 2
    assert S.read_snapshot(spark, table).count() == 140
    # merge keeps the branch; DROP is explicit
    assert "dev" in list_branches(table)
    engine_sql(spark, "DROP BRANCH dev ON t", tables=t)
    assert "dev" not in list_branches(table)


def test_streaming_lands_on_branch_then_merges(spark, table, tmp_path):
    """stream_commit_branch: micro-batches land as branch versions main
    cannot see; a replayed drain is idempotent; the audited ingest merges
    to main as one metadata-only commit."""
    from telemetry_parquet_spark.streaming.pipelines import (
        stream_commit_branch,
    )

    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    create_branch(table, "ingest")
    _df(spark, 100, 130).write.mode("append").parquet(src)
    stream_commit_branch(spark, src, table, "ingest", ckpt)
    _df(spark, 130, 140).write.mode("append").parquet(src)
    stream_commit_branch(spark, src, table, "ingest", ckpt)
    # two drains = two branch commits; main untouched
    assert list_branches(table)["ingest"] == 2
    assert S.read_snapshot(spark, table).count() == 100
    assert read_branch(spark, table, "ingest").count() == 140
    # replay with nothing new: no extra commits (checkpoint + stamp)
    stream_commit_branch(spark, src, table, "ingest", ckpt)
    assert list_branches(table)["ingest"] == 2
    # batch-id stamps rode into the branch manifests atomically
    from telemetry_parquet_spark.sources.branches import (
        read_branch_manifest,
    )

    stamps = [
        read_branch_manifest(table, "ingest", k).get("batch_id")
        for k in (1, 2)
    ]
    assert stamps == [0, 0] or stamps == [0, 1]  # per-drain batch ids
    # audit on the branch, then one metadata-only merge
    assert read_branch(spark, table, "ingest").where("k < 0").count() == 0
    merge_branch(spark, table, "ingest")
    assert S.read_snapshot(spark, table).count() == 140


def _spec_table(spark, tmp_path, name="spec_t"):
    from telemetry_parquet_spark.sources.partition_spec import (
        PartitionField,
        set_partition_spec,
    )

    root = str(tmp_path / name)
    S.append(spark, root, _df(spark, 0, 100))
    set_partition_spec(root, [PartitionField("g", "bucket", 4)])
    S.compact_table(spark, root, target_bytes=1 << 26)  # tuple everything
    return root


def test_branch_append_writes_spec_tuples_fast_forward(spark, tmp_path):
    """The WAP-via-branch lifecycle keeps the table fully tupled: fork a
    spec'd table, land rows on the branch, audit, fast-forward merge —
    then the spec fast paths (tuple pruning, partition rollup) still
    engage on main instead of silently degrading to scans."""
    from telemetry_parquet_spark.sources.partition_spec import (
        snapshot_groupby_partition,
    )
    from telemetry_parquet_spark.sources.scan_planner import Eq

    root = _spec_table(spark, tmp_path)
    create_branch(root, "land")
    branch_append(spark, root, "land", _df(spark, 100, 180))
    # audit on the branch, then merge (main unchanged -> fast-forward)
    assert read_branch(spark, root, "land").count() == 180
    v = merge_branch(spark, root, "land")
    m = S.read_manifest(root, v)
    assert set(m["partitions"]) == set(m["files"])  # fully tupled
    pruned, plan = S.plan_snapshot_scan(
        spark, root, [Eq("g", 3)], require_pruning=True
    )
    assert any(n == "spec:g" for n, _ in plan.steps)
    assert pruned.count() == 180 // 5  # ids 0..180, g = id % 5
    # the manifest-only rollup still answers (refuses on untupled files)
    fields, groups = snapshot_groupby_partition(root, agg_cols=("k",))
    assert sum(g["n_rows"] for g in groups.values()) == 180


def test_branch_append_tuples_survive_rebase_merge(spark, tmp_path):
    """Main advances while the branch works: the rebase merge carries
    the branch files' tuples alongside main's own."""
    from telemetry_parquet_spark.sources.scan_planner import Eq

    root = _spec_table(spark, tmp_path)
    create_branch(root, "land")
    branch_append(spark, root, "land", _df(spark, 100, 150))
    S.append(spark, root, _df(spark, 200, 240))  # concurrent main commit
    v = merge_branch(spark, root, "land")
    m = S.read_manifest(root, v)
    assert set(m["partitions"]) == set(m["files"])
    assert S.read_snapshot(spark, root).count() == 190
    pruned, plan = S.plan_snapshot_scan(
        spark, root, [Eq("g", 2)], require_pruning=True
    )
    exp = sum(1 for i in list(range(100, 150)) + list(range(0, 100))
              + list(range(200, 240)) if i % 5 == 2)
    assert pruned.count() == exp


def test_branch_bucket_join_after_merge(spark, tmp_path):
    """End-to-end proof the storage-partitioned join survives a branch
    merge: land rows on a branch of the bucketed fact, merge, then
    plan_bucket_join runs with zero join shuffles."""
    from telemetry_parquet_spark.sources.join_planner import (
        plan_bucket_join,
    )
    from telemetry_parquet_spark.sources.partition_spec import (
        PartitionField,
        set_partition_spec,
    )

    fact = _spec_table(spark, tmp_path, "fact")
    create_branch(fact, "land")
    branch_append(spark, fact, "land", _df(spark, 100, 160))
    merge_branch(spark, fact, "land")
    dim = str(tmp_path / "dim")
    S.append(spark, dim, spark.range(0, 5).select(
        F.col("id").alias("gk"), (F.col("id") * 10).alias("w")
    ))
    set_partition_spec(dim, [PartitionField("gk", "bucket", 4)])
    S.compact_table(spark, dim, target_bytes=1 << 26)
    joined, plan = plan_bucket_join(
        spark, fact, dim, ("g", "gk"), require_broadcast=True
    )
    assert joined.count() == 160  # every row matches exactly one dim row
    p = joined._jdf.queryExecution().executedPlan().toString()
    final = p.split("== Initial Plan ==")[0]
    assert "Exchange" not in final.replace("BroadcastExchange", "")


def test_branch_cow_delete_drops_tuples_conservatively(spark, tmp_path):
    """A branch COW delete rewrites files WITHOUT tuples (same as main):
    the merged table keeps correct answers, fast paths degrade loudly
    (rollup returns None) instead of answering wrong."""
    from telemetry_parquet_spark.sources.partition_spec import (
        snapshot_groupby_partition,
    )

    root = _spec_table(spark, tmp_path)
    create_branch(root, "dev")
    branch_delete_where(spark, root, "dev", "g = 0")
    v = merge_branch(spark, root, "dev")
    m = S.read_manifest(root, v)
    assert set(m["partitions"]) < set(m["files"])  # rewrites untupled
    assert S.read_snapshot(spark, root).count() == 80
    assert snapshot_groupby_partition(root, agg_cols=("k",)) is None
