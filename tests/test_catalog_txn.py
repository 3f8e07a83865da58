"""Catalog commit log: cross-table consistent snapshots and multi-table
atomic transactions (sources/catalog.py::commit_snapshot / read / sql_at
/ CatalogTransaction). The catalog is the root of truth — all tables
advance together in one O_EXCL catalog commit, or none do."""

from __future__ import annotations

import pytest

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(str(tmp_path / "cat"))
    c.create_table(
        spark,
        "facts",
        spark.createDataFrame([(i, float(i)) for i in range(10)], "k int, x double"),
    )
    c.create_table(
        spark,
        "dims",
        spark.createDataFrame([(i, f"d{i}") for i in range(3)], "k int, name string"),
    )
    return c


def _counts(spark, c, v=None):
    return (
        c.read(spark, "facts", v).count(),
        c.read(spark, "dims", v).count(),
    )


def test_transaction_commits_all_tables_atomically(spark, cat):
    v0 = cat.commit_snapshot()
    facts2 = spark.createDataFrame([(100, 1.0), (101, 2.0)], "k int, x double")
    dims2 = spark.createDataFrame([(100, "d100")], "k int, name string")
    with cat.transaction(spark) as tx:
        tx.append("facts", facts2)
        tx.append("dims", dims2)
        # inside the block NOTHING is visible anywhere
        assert _counts(spark, cat) == (10, 3)
        assert cat.catalog_version() == v0
        assert S.list_staged(cat.table_root("facts"))  # staged, invisible
    v1 = cat.catalog_version()
    assert v1 == v0 + 1
    assert _counts(spark, cat) == (12, 4)          # head sees both
    assert _counts(spark, cat, v1) == (12, 4)      # pinned sees both
    assert _counts(spark, cat, v0) == (10, 3)      # the old world intact
    assert not S.list_staged(cat.table_root("facts"))  # stages consumed
    pins = cat.pins_at(v1)
    assert pins["facts"] == S.latest_version(cat.table_root("facts"))
    assert pins["dims"] == S.latest_version(cat.table_root("dims"))


def test_transaction_abort_discards_everything(spark, cat):
    v0 = cat.commit_snapshot()
    h_facts = S.latest_version(cat.table_root("facts"))
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction(spark) as tx:
            tx.append(
                "facts",
                spark.createDataFrame([(999, 9.0)], "k int, x double"),
            )
            raise RuntimeError("boom")
    assert cat.catalog_version() == v0                     # no catalog commit
    assert S.latest_version(cat.table_root("facts")) == h_facts  # no table commit
    assert not S.list_staged(cat.table_root("facts"))      # stage discarded
    assert _counts(spark, cat) == (10, 3)


def test_transaction_rebases_over_concurrent_head_move(spark, cat):
    tx = cat.transaction(spark)
    tx.append("facts", spark.createDataFrame([(200, 2.0)], "k int, x double"))
    # a concurrent writer advances facts between stage and publish
    S.append(
        spark,
        cat.table_root("facts"),
        spark.createDataFrame([(300, 3.0)], "k int, x double"),
    )
    v = tx.commit()
    pins = cat.pins_at(v)
    facts = cat.read(spark, "facts", v)
    ks = {r.k for r in facts.select("k").collect()}
    assert {200, 300} <= ks  # rebase kept both writers' rows
    assert pins["facts"] == S.latest_version(cat.table_root("facts"))
    m = S.read_manifest(cat.table_root("facts"), pins["facts"])
    assert m["action"] == "wap-publish" and "rebased_from" in m


def test_transaction_commits_exactly_once(spark, cat):
    tx = cat.transaction(spark)
    tx.append("dims", spark.createDataFrame([(7, "d7")], "k int, name string"))
    tx.commit()
    with pytest.raises(RuntimeError, match="already"):
        tx.commit()
    with pytest.raises(RuntimeError, match="already"):
        tx.append("dims", spark.createDataFrame([(8, "d8")], "k int, name string"))


def test_sql_at_consistent_world_and_mutator_rejection(spark, cat):
    v0 = cat.commit_snapshot()
    with cat.transaction(spark) as tx:
        tx.append("facts", spark.createDataFrame([(5, 50.0)], "k int, x double"))
        tx.append("dims", spark.createDataFrame([(5, "dup5")], "k int, name string"))
    v1 = cat.catalog_version()
    joined_old = cat.sql_at(
        spark,
        "SELECT COUNT(*) AS n FROM facts JOIN dims ON facts.k = dims.k",
        v0,
    ).first().n
    joined_new = cat.sql_at(
        spark,
        "SELECT COUNT(*) AS n FROM facts JOIN dims ON facts.k = dims.k",
        v1,
    ).first().n
    assert joined_old == 3      # k in {0,1,2}
    assert joined_new == 3 + 2  # + two facts rows with k=5 × the new dim
    with pytest.raises(ValueError, match="only queries"):
        cat.sql_at(spark, "DELETE FROM facts WHERE k = 1", v1)


def test_commit_snapshot_pins_survive_later_writes(spark, cat):
    v0 = cat.commit_snapshot()
    S.append(
        spark,
        cat.table_root("facts"),
        spark.createDataFrame([(400, 4.0)], "k int, x double"),
    )
    assert cat.read(spark, "facts", v0).count() == 10  # pin unaffected
    assert cat.read(spark, "facts").count() == 11      # head moved
    hist = cat.sql(spark, "DESCRIBE CATALOG HISTORY").collect()
    assert [r.version for r in hist] == list(range(v0 + 1))
    assert '"facts": 1' in hist[v0].pins


def test_transaction_deletes_entity_across_tables(spark, cat):
    """The GDPR shape: one transaction removes k=2 from BOTH tables via
    staged merge-on-read deletes; nothing disappears until the single
    catalog commit, and the old catalog version still shows the rows."""
    v0 = cat.commit_snapshot()
    with cat.transaction(spark) as tx:
        tx.delete_where("facts", "k = 2")
        tx.delete_where("dims", "k = 2")
        assert _counts(spark, cat) == (10, 3)  # invisible while staged
    v1 = cat.catalog_version()
    assert _counts(spark, cat, v1) == (9, 2)
    assert _counts(spark, cat, v0) == (10, 3)
    for t in ("facts", "dims"):
        ks = {r.k for r in cat.read(spark, t, v1).select("k").collect()}
        assert 2 not in ks
        m = S.read_manifest(
            cat.table_root(t), cat.pins_at(v1)[t]
        )
        assert m["action"] == "wap-publish-delete" and m["dv"]


def test_staged_delete_rebases_over_append_refuses_rewrite(spark, cat):
    root = cat.table_root("facts")
    S.stage_delete_mor(spark, root, "k < 2", "d1")
    # an append commutes: the frozen vector never references new files
    S.append(spark, root, spark.createDataFrame([(1, 111.0)], "k int, x double"))
    v = S.publish_staged(spark, root, "d1")
    ks = sorted(r.k for r in S.read_snapshot(spark, root, v).select("k").collect())
    # stage-time k in {0,1} gone; the concurrently-appended k=1 SURVIVES
    # (positions were frozen before it existed — the documented contract)
    assert ks == [1] + list(range(2, 10))
    # a compaction rewrite does NOT commute
    S.stage_delete_mor(spark, root, "k = 5", "d2")
    S.compact_table(spark, root, target_bytes=1 << 30)
    with pytest.raises(ValueError, match="rewritten since"):
        S.publish_staged(spark, root, "d2")
    S.discard_staged(root, "d2")
    # nor does a concurrent deletion vector
    S.stage_delete_mor(spark, root, "k = 5", "d3")
    S.delete_where_mor(spark, root, "k = 6")
    with pytest.raises(ValueError, match="vectors changed"):
        S.publish_staged(spark, root, "d3")
    S.discard_staged(root, "d3")


def test_staged_delete_audit_sees_doomed_rows_and_can_veto(spark, cat):
    root = cat.table_root("dims")
    S.stage_delete_mor(spark, root, "k <= 1", "dd")
    seen = []

    def audit(df):
        seen.extend(sorted(r.k for r in df.select("k").collect()))
        if len(seen) > 1:
            raise RuntimeError("too many rows doomed")

    with pytest.raises(RuntimeError, match="too many"):
        S.publish_staged(spark, root, "dd", audits=[audit])
    assert seen == [0, 1]
    assert S.list_staged(root) == ["dd"]  # veto keeps the stage
    assert S.read_snapshot(spark, root).count() == 3  # nothing deleted
    S.discard_staged(root, "dd")


def test_transaction_mixed_dml_across_tables(spark, cat):
    """Insert + update + delete in ONE transaction across two tables —
    the full DML triangle lands as one catalog commit."""
    from pyspark.sql import functions as F

    v0 = cat.commit_snapshot()
    with cat.transaction(spark) as tx:
        tx.append("facts", spark.createDataFrame([(50, 5.5)], "k int, x double"))
        tx.update_where("facts", "k = 1", {"x": "x * 100"})
        tx.delete_where("dims", "k = 0")
        assert _counts(spark, cat) == (10, 3)
    v1 = cat.catalog_version()
    assert _counts(spark, cat, v0) == (10, 3)
    assert _counts(spark, cat, v1) == (11, 2)
    facts = cat.read(spark, "facts", v1)
    assert facts.where("k = 1").first().x == 100.0
    assert facts.agg(F.sum("x")).first()[0] == pytest.approx(
        sum(float(i) for i in range(10)) - 1.0 + 100.0 + 5.5
    )


def test_staged_update_audit_and_commute_rules(spark, cat):
    root = cat.table_root("facts")
    S.stage_update_mor(spark, root, "k >= 8", {"x": "x + 0.5"}, "u1")
    # audit sees the UPDATED copies; veto keeps the stage
    with pytest.raises(RuntimeError, match="nope"):
        S.publish_staged(
            spark, root, "u1",
            audits=[lambda df: (_ for _ in ()).throw(RuntimeError("nope"))],
        )
    assert S.list_staged(root) == ["u1"]
    # an append commutes; the update still publishes (rebased)
    S.append(spark, root, spark.createDataFrame([(20, 0.25)], "k int, x double"))
    seen = []
    v = S.publish_staged(
        spark, root, "u1",
        audits=[lambda df: seen.extend(sorted(r.x for r in df.collect()))],
    )
    assert seen == [8.5, 9.5]
    got = {r.k: r.x for r in S.read_snapshot(spark, root, v).collect()}
    assert got[8] == 8.5 and got[9] == 9.5 and got[20] == 0.25
    assert S.read_manifest(root, v)["action"] == "wap-publish-update"
    # a concurrent vector refuses
    S.stage_update_mor(spark, root, "k = 0", {"x": "0.0"}, "u2")
    S.delete_where_mor(spark, root, "k = 3")
    with pytest.raises(ValueError, match="vectors changed"):
        S.publish_staged(spark, root, "u2")
    S.discard_staged(root, "u2")


def test_staged_update_revalidates_constraints_on_rebase(spark, cat):
    root = cat.table_root("facts")
    S.stage_update_mor(spark, root, "k = 2", {"x": "-5.0"}, "u3")
    # constraint added AFTER staging: the rebased publish must re-check
    S.add_check_constraint(spark, root, "x_nonneg", "x >= 0")
    with pytest.raises(ValueError, match="x_nonneg"):
        S.publish_staged(spark, root, "u3")
    S.discard_staged(root, "u3")


def test_concurrent_transactions_both_land(spark, cat):
    """Two append-only transactions racing the same tables: appends
    commute (WAP publish rebases), catalog commits retry on O_EXCL
    conflict — both transactions must land, neither lost, and the later
    catalog version's pins must see BOTH transactions' rows."""
    import threading

    errs = []

    def run(i):
        try:
            with cat.transaction(spark) as tx:
                tx.append(
                    "facts",
                    spark.createDataFrame(
                        [(1000 + i, float(i))], "k int, x double"
                    ),
                )
                tx.append(
                    "dims",
                    spark.createDataFrame(
                        [(1000 + i, f"t{i}")], "k int, name string"
                    ),
                )
        except Exception as e:
            errs.append(repr(e))

    threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert cat.catalog_version() >= 2  # three txn commits (0-based)
    latest = cat.catalog_version()
    facts = cat.read(spark, "facts", latest)
    dims = cat.read(spark, "dims", latest)
    for i in range(3):
        assert facts.where(f"k = {1000 + i}").count() == 1
        assert dims.where(f"k = {1000 + i}").count() == 1


def test_crash_between_publish_and_catalog_commit_is_safe(spark, cat):
    """The documented trade of catalog-rooted atomicity: simulate a
    crash AFTER one table's publish but BEFORE the catalog commit —
    catalog readers stay on the old consistent pins (the atomicity
    contract holds for them); the published table is ahead at table
    level; the still-staged second table is invisible everywhere and
    discoverable for recovery via list_staged."""
    v0 = cat.commit_snapshot()
    froot, droot = cat.table_root("facts"), cat.table_root("dims")
    S.stage_append(
        spark, froot,
        spark.createDataFrame([(77, 7.0)], "k int, x double"), "crash-0"
    )
    S.stage_append(
        spark, droot,
        spark.createDataFrame([(77, "d77")], "k int, name string"), "crash-1"
    )
    S.publish_staged(spark, froot, "crash-0")
    # -- crash here: no catalog commit, dims still staged --
    assert cat.catalog_version() == v0
    assert _counts(spark, cat, v0) == (10, 3)   # catalog world consistent
    assert cat.read(spark, "facts").count() == 11  # table-level ahead
    assert cat.read(spark, "dims").count() == 3
    assert S.list_staged(droot) == ["crash-1"]  # recoverable
    # recovery path A: finish the transaction by hand
    S.publish_staged(spark, droot, "crash-1")
    v1 = cat.commit_snapshot(action="recovered-txn")
    assert _counts(spark, cat, v1) == (11, 4)


def test_catalog_vacuum_keeps_pinned_versions_readable(spark, cat):
    """Table-level vacuum would reclaim versions catalog snapshots still
    pin; Catalog.vacuum passes the surviving pins as explicit keeps, so
    every retained catalog version stays readable after retention."""
    v0 = cat.commit_snapshot()
    for i in range(3):  # churn facts: 3 more table versions
        S.append(
            spark,
            cat.table_root("facts"),
            spark.createDataFrame([(500 + i, 0.5)], "k int, x double"),
        )
    v1 = cat.commit_snapshot()
    # keep BOTH catalog versions: every pinned table version must survive
    removed = cat.vacuum(keep_last_catalog=2, keep_last_table=1)
    assert _counts(spark, cat, v0) == (10, 3)
    assert _counts(spark, cat, v1) == (13, 3)
    # now retain only the latest catalog version: v0's pins may go
    cat.vacuum(keep_last_catalog=1, keep_last_table=1)
    with pytest.raises(FileNotFoundError):
        cat.pins_at(v0)
    assert _counts(spark, cat, v1) == (13, 3)  # the survivor still reads
    assert isinstance(removed, dict) and set(removed) == {"facts", "dims"}


def test_catalog_log_readers_tolerate_vacuum_gaps(spark, cat):
    """Vacuum makes the catalog log NON-contiguous; every reader must
    iterate surviving versions, not range(head+1)."""
    import time

    for _ in range(3):
        S.append(
            spark, cat.table_root("facts"),
            spark.createDataFrame([(1, 1.0)], "k int, x double"),
        )
        cat.commit_snapshot()
    cat.vacuum(keep_last_catalog=1, keep_last_table=1)  # drops v0, v1
    head = cat.catalog_version()
    assert head == 2
    assert cat.catalog_version_as_of(time.time()) == head
    hist = cat.sql(spark, "DESCRIBE CATALOG HISTORY").collect()
    assert [r.version for r in hist] == [head]
    cat.vacuum(keep_last_catalog=3, keep_last_table=1)  # re-run: no crash


def test_catalog_version_as_of_timestamp(spark, cat):
    import time

    v0 = cat.commit_snapshot()
    t_mid = time.time()
    time.sleep(0.01)
    S.append(
        spark,
        cat.table_root("facts"),
        spark.createDataFrame([(900, 9.0)], "k int, x double"),
    )
    v1 = cat.commit_snapshot()
    assert cat.catalog_version_as_of(t_mid) == v0
    assert cat.catalog_version_as_of(time.time()) == v1
    with pytest.raises(FileNotFoundError):
        cat.catalog_version_as_of(0.0)
    n = cat.sql_at(
        spark, "SELECT COUNT(*) AS n FROM facts",
        cat.catalog_version_as_of(t_mid),
    ).first().n
    assert n == 10


def test_table_cataloged_after_snapshot_is_absent_from_pin(spark, cat):
    v0 = cat.commit_snapshot()
    cat.create_table(
        spark, "late", spark.createDataFrame([(1,)], "k int")
    )
    with pytest.raises(KeyError, match="cataloged after"):
        cat.read(spark, "late", v0)
    v1 = cat.commit_snapshot()
    assert cat.read(spark, "late", v1).count() == 1


def test_transaction_append_writes_spec_tuples(spark, cat):
    """A transactional multi-table commit into spec'd tables stages
    through the spec-aware writer: after commit, every file carries a
    partition tuple and point-lookup pruning engages."""
    from telemetry_parquet_spark.sources import snapshots as S
    from telemetry_parquet_spark.sources.partition_spec import (
        PartitionField,
        set_partition_spec,
    )
    from telemetry_parquet_spark.sources.scan_planner import Eq

    froot = cat.table_root("facts")
    droot = cat.table_root("dims")
    for root, col in ((froot, "k"), (droot, "k")):
        set_partition_spec(root, [PartitionField(col, "bucket", 4)])
        S.compact_table(spark, root, target_bytes=1 << 26)
    with cat.transaction(spark) as txn:
        txn.append("facts", spark.createDataFrame(
            [(i, float(i)) for i in range(100, 140)], "k int, x double"
        ))
        txn.append("dims", spark.createDataFrame(
            [(7, "d7")], "k int, name string"
        ))
    for root, n in ((froot, 50), (droot, 4)):
        m = S.read_manifest(root, S.latest_version(root))
        assert set(m["partitions"]) == set(m["files"]), root
        assert S.read_snapshot(spark, root).count() == n
    pruned, plan = S.plan_snapshot_scan(
        spark, froot, [Eq("k", 120)], require_pruning=True
    )
    assert any(name == "spec:k" for name, _ in plan.steps)
    assert pruned.count() == 1


def test_staged_append_tuples_survive_rebased_publish(spark, cat):
    """stage -> concurrent head move -> publish: the rebased publish
    still lands the stage-time tuples."""
    from telemetry_parquet_spark.sources import snapshots as S
    from telemetry_parquet_spark.sources.partition_spec import (
        PartitionField,
        set_partition_spec,
    )

    root = cat.table_root("facts")
    set_partition_spec(root, [PartitionField("k", "bucket", 4)])
    S.compact_table(spark, root, target_bytes=1 << 26)
    S.stage_append(spark, root, spark.createDataFrame(
        [(200, 1.0)], "k int, x double"
    ), "w1")
    S.append(spark, root, spark.createDataFrame(  # head moves
        [(300, 2.0)], "k int, x double"
    ))
    v = S.publish_staged(spark, root, "w1")
    m = S.read_manifest(root, v)
    assert set(m["partitions"]) == set(m["files"])
    assert S.read_snapshot(spark, root).count() == 12
