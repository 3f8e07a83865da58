"""SQL front door tests (sources/sql_front.py): VERSION AS OF /
TIMESTAMP AS OF rewriting onto manifest-pinned snapshot reads, bare-name
HEAD resolution, DESCRIBE HISTORY, and cross-version joins as one
statement."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources.snapshots import (
    append,
    delete_where,
    read_manifest,
    read_snapshot,
)
from telemetry_parquet_spark.sources.sql_front import (
    describe_history,
    engine_sql,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    """v1 = orderkey%10<7, v2 = full orders, v3 = minus '1-URGENT'."""
    root = str(tmp_path / "tbl")
    orders = _orders(spark, sf_dir)
    append(spark, root, orders.where(F.col("o_orderkey") % 10 < 7))
    append(spark, root, orders.where(F.col("o_orderkey") % 10 >= 7))
    delete_where(spark, root, "o_orderpriority = '1-URGENT'")
    return root


def test_version_as_of_matches_read_snapshot(spark, table):
    for v in (1, 2, 3):
        got = engine_sql(
            spark,
            f"SELECT * FROM t VERSION AS OF {v}",
            tables={"t": table},
        )
        assert _multiset(got) == _multiset(read_snapshot(spark, table, v))


def test_bare_name_is_head(spark, table):
    got = engine_sql(spark, "SELECT COUNT(*) AS n FROM t", {"t": table})
    assert got.first().n == read_snapshot(spark, table).count()


def test_timestamp_as_of_resolves_between_commits(spark, table):
    t1 = read_manifest(table, 1)["committed_at"]
    t2 = read_manifest(table, 2)["committed_at"]
    if t2 <= t1:
        pytest.skip("commit timestamps not distinct on this run")
    # a timestamp at (or just after) v1's commit but before v2's sees v1
    ts = t1 + min(1e-4, (t2 - t1) / 2)
    got = engine_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF {ts!r}",
        tables={"t": table},
    )
    assert got.first().n == read_snapshot(spark, table, 1).count()
    # before the table existed -> loud error
    with pytest.raises(FileNotFoundError):
        engine_sql(
            spark,
            f"SELECT * FROM t TIMESTAMP AS OF {t1 - 10.0!r}",
            tables={"t": table},
        )


def test_cross_version_join_single_statement(spark, table):
    out = engine_sql(
        spark,
        """
        SELECT a.n - b.n AS n_deleted
        FROM (SELECT COUNT(*) AS n FROM t VERSION AS OF 2) a
        CROSS JOIN (SELECT COUNT(*) AS n FROM t VERSION AS OF 3) b
        """,
        tables={"t": table},
    ).first()
    expected = (
        read_snapshot(spark, table, 2)
        .where(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert out.n_deleted == expected


def test_describe_history(spark, table):
    rows = engine_sql(
        spark, "DESCRIBE HISTORY t", tables={"t": table}
    ).collect()
    assert [r.version for r in rows] == [0, 1, 2, 3]
    assert [r.action for r in rows] == [
        "create", "append", "append", "delete",
    ]
    assert rows[0].parent is None and rows[3].parent == 2
    # and the function form agrees
    assert _multiset(describe_history(spark, table)) == sorted(
        tuple(r) for r in rows
    )


def test_unknown_history_table_raises(spark, table):
    with pytest.raises(KeyError):
        engine_sql(spark, "DESCRIBE HISTORY nope", tables={"t": table})


def test_dml_round_trip(spark, sf_dir, tmp_path):
    """The DML surface: INSERT INTO/OVERWRITE, UPDATE (MOR), DELETE
    (COW), OPTIMIZE, RESTORE, VACUUM — all through one front door."""
    from telemetry_parquet_spark.sources.snapshots import (
        history as snap_history,
    )

    orders = _orders(spark, sf_dir)
    root = str(tmp_path / "dml")
    t = {"t": root}
    orders.where(F.col("o_orderkey") % 10 < 7).createOrReplaceTempView(
        "dml_src_a"
    )
    orders.where(F.col("o_orderkey") % 10 >= 7).createOrReplaceTempView(
        "dml_src_b"
    )

    r = engine_sql(spark, "INSERT INTO t SELECT * FROM dml_src_a", t)
    assert (r.first().action, r.first().version) == ("append", 1)
    engine_sql(spark, "INSERT INTO t SELECT * FROM dml_src_b", t)
    assert engine_sql(spark, "SELECT COUNT(*) AS n FROM t", t).first().n \
        == orders.count()

    # UPDATE is merge-on-read: masked + copied, count conserved
    r = engine_sql(
        spark,
        "UPDATE t SET o_orderpriority = 'X' "
        "WHERE o_orderpriority = '1-URGENT'",
        t,
    ).first()
    assert r.action == "update-mor"
    n_urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").count()
    got = engine_sql(
        spark,
        "SELECT COUNT(*) AS total, "
        "SUM(CASE WHEN o_orderpriority = 'X' THEN 1 ELSE 0 END) AS nx "
        "FROM t",
        t,
    ).first()
    assert (got.total, got.nx) == (orders.count(), n_urgent)

    # OPTIMIZE materializes the DV; DELETE (COW) then works
    engine_sql(spark, "OPTIMIZE t", t)
    engine_sql(spark, "DELETE FROM t WHERE o_orderpriority = 'X'", t)
    assert engine_sql(spark, "SELECT COUNT(*) AS n FROM t", t).first().n \
        == orders.count() - n_urgent

    # INSERT OVERWRITE replaces; RESTORE rolls back as a commit
    pre_overwrite = engine_sql(
        spark, "SELECT COUNT(*) AS n FROM t", t
    ).first().n
    r = engine_sql(
        spark, "INSERT OVERWRITE t SELECT * FROM dml_src_a LIMIT 5", t
    ).first()
    assert r.action == "overwrite"
    assert engine_sql(spark, "SELECT COUNT(*) AS n FROM t", t).first().n == 5
    engine_sql(
        spark, f"RESTORE t TO VERSION AS OF {r.version - 1}", t
    )
    assert engine_sql(spark, "SELECT COUNT(*) AS n FROM t", t).first().n \
        == pre_overwrite

    # VACUUM retains the head chain; files for dropped versions reclaimed
    r = engine_sql(spark, "VACUUM t RETAIN 2 VERSIONS", t).first()
    assert r.action.startswith("vacuum:")
    assert engine_sql(spark, "SELECT COUNT(*) AS n FROM t", t).first().n \
        == pre_overwrite
    assert len(snap_history(root)) == 2


def test_insert_select_from_time_travel(spark, sf_dir, tmp_path):
    """INSERT … SELECT FROM <t> VERSION AS OF n goes through the same
    rewriter — derived tables can be built from historical versions."""
    orders = _orders(spark, sf_dir)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    t = {"src": a, "dst": b}
    orders.limit(100).createOrReplaceTempView("tt_seed")
    engine_sql(spark, "INSERT INTO src SELECT * FROM tt_seed", t)
    engine_sql(spark, "DELETE FROM src WHERE o_orderkey % 2 = 0", t)
    engine_sql(
        spark,
        "INSERT INTO dst SELECT * FROM src VERSION AS OF 1 "
        "WHERE o_orderkey % 2 = 0",
        t,
    )
    n_even = (
        orders.limit(100).where(F.col("o_orderkey") % 2 == 0).count()
    )
    assert engine_sql(
        spark, "SELECT COUNT(*) AS n FROM dst", t
    ).first().n == n_even


def test_version_as_of_tag_name(spark, table):
    """VERSION AS OF 'tag' resolves through the tag registry."""
    from telemetry_parquet_spark.sources.snapshots import create_tag

    create_tag(table, "pre_delete", 2)
    got = engine_sql(
        spark,
        "SELECT COUNT(*) AS n FROM t VERSION AS OF 'pre_delete'",
        tables={"t": table},
    )
    assert got.first().n == read_snapshot(spark, table, 2).count()


def test_describe_detail(spark, sf_dir, tmp_path):
    from telemetry_parquet_spark.sources.snapshots import (
        add_check_constraint,
        append,
        create_tag,
        stage_append,
    )
    from telemetry_parquet_spark.sources.sql_front import engine_sql

    root = str(tmp_path / "dd")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    append(spark, root, orders)
    add_check_constraint(spark, root, "pos_key", "o_orderkey >= 0")
    create_tag(root, "release-1")
    stage_append(spark, root, orders.limit(5), "pending")
    row = engine_sql(
        spark, "DESCRIBE DETAIL snap", tables={"snap": root}
    ).first()
    assert row.version == 2  # append + add-constraint
    assert row.action == "add-constraint"
    assert row.n_files >= 1 and row.n_dv == 0
    assert row.size_bytes > 0 and row.n_columns == 6
    assert row.constraints == "pos_key"
    assert row.tags == "release-1"
    assert row.staged == "pending"


def test_merge_into_statement(spark, sf_dir, tmp_path):
    """Row-level MERGE INTO through the front door: the restricted
    update-all/insert-all form routes to the COW merge commit; updates
    land, inserts land, untouched rows survive, and any conditional
    WHEN clause is a loud error rather than a silent misread."""
    import os as _os

    from telemetry_parquet_spark.sources.snapshots import (
        append,
        read_snapshot,
    )
    from telemetry_parquet_spark.sources.sql_front import engine_sql

    src = spark.read.parquet(_os.path.join(sf_dir, "orders.parquet"))
    root = str(tmp_path / "t")
    append(spark, root, src.where("o_orderkey % 10 < 7"))

    cols = (
        "o_orderkey, o_custkey + 500000 AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority"
    )
    # source = updated copies of the %10 IN (5,6) rows, read through
    # time travel inside the USING subquery (same rewriter)
    out = engine_sql(
        spark,
        f"MERGE INTO t USING (SELECT {cols} FROM t VERSION AS OF 1 "
        "WHERE o_orderkey % 10 IN (5, 6)) ON o_orderkey "
        "WHEN MATCHED THEN UPDATE ALL WHEN NOT MATCHED THEN INSERT ALL",
        {"t": root},
    )
    assert out.first().action == "merge-into"
    cur = read_snapshot(spark, root)
    n_touched = src.where("o_orderkey % 10 IN (5, 6)").count()
    assert (
        cur.where("o_orderkey % 10 IN (5,6) AND o_custkey >= 500000")
        .count() == n_touched
    )
    assert cur.count() == src.where("o_orderkey % 10 < 7").count()
    # untouched rows keep their values
    exp_untouched = src.where("o_orderkey % 10 IN (0,1,2,3,4)")
    got_untouched = cur.where("o_orderkey % 10 IN (0,1,2,3,4)")
    assert got_untouched.exceptAll(exp_untouched).count() == 0

    # conditional / DELETE forms now ROUTE to merge_into_conditional
    # (tests/test_merge_conditional.py pins their semantics); what must
    # stay loud is (a) downstream validation of a routed statement and
    # (b) a clause tail the grammar cannot parse
    import pytest as _pytest

    with _pytest.raises(ValueError, match="source columns"):
        engine_sql(
            spark,
            "MERGE INTO t USING (SELECT 1) ON k "
            "WHEN MATCHED AND x THEN DELETE",
            {"t": root},
        )
    with _pytest.raises(ValueError, match="cannot parse clause tail"):
        engine_sql(
            spark,
            "MERGE INTO t USING (SELECT 1) ON k "
            "WHEN MATCHED THEN FROB *",
            {"t": root},
        )


def test_table_changes_statement(spark, sf_dir, tmp_path):
    """TABLE CHANGES <t> FROM <v> TO <v> routes to the CDC feed:
    an append shows as inserts only, a COW delete as deletes only, and
    tag names resolve on both endpoints."""
    import os as _os

    from telemetry_parquet_spark.sources.snapshots import (
        append,
        create_tag,
        delete_where,
    )
    from telemetry_parquet_spark.sources.sql_front import engine_sql

    src = spark.read.parquet(_os.path.join(sf_dir, "orders.parquet"))
    root = str(tmp_path / "t")
    append(spark, root, src.where("o_orderkey % 10 < 7"))
    append(spark, root, src.where("o_orderkey % 10 >= 7"))
    delete_where(spark, root, "o_orderpriority = '1-URGENT'")
    create_tag(root, "before-delete", 2)

    ins = engine_sql(
        spark, "TABLE CHANGES t FROM 1 TO 2", {"t": root}
    )
    n_new = src.where("o_orderkey % 10 >= 7").count()
    assert ins.where("_change = 'insert'").count() == n_new
    assert ins.where("_change = 'delete'").count() == 0

    dels = engine_sql(
        spark, "TABLE CHANGES t FROM 'before-delete' TO 3", {"t": root}
    )
    assert dels.where("_change = 'delete'").count() == \
        src.where("o_orderpriority = '1-URGENT'").count()
    assert dels.where("_change = 'insert'").count() == 0


def test_describe_stats(spark, sf_dir, tmp_path):
    """DESCRIBE STATS: per-column coverage of the metadata-aggregate
    layer — integer columns fully covered and answerable, doubles and
    strings carrying min/max but no sums, temporal columns excluded
    from both fast paths."""
    import os as _os

    src = spark.read.parquet(_os.path.join(sf_dir, "orders.parquet"))
    root = str(tmp_path / "t")
    append(spark, root, src.repartition(4))

    rows = {
        r.column: r
        for r in engine_sql(
            spark, "DESCRIBE STATS t", {"t": root}
        ).collect()
    }
    assert set(rows) == set(src.columns)
    ck = rows["o_custkey"]
    assert ck.n_files == ck.n_minmax == ck.n_sums == ck.n_nullcounts == 4
    assert ck.total_nulls == 0
    assert ck.minmax_answerable and ck.sum_answerable
    tp = rows["o_totalprice"]  # double: stats yes, sums no
    assert tp.n_minmax == 4 and tp.n_sums == 0
    assert not tp.sum_answerable and not tp.minmax_answerable  # not int
    od = rows["o_orderdate"]  # temporal ordinal: excluded from both
    assert not od.minmax_answerable and not od.sum_answerable


def test_set_partition_spec_statement(spark, sf_dir, tmp_path):
    """ALTER TABLE … SET PARTITION SPEC + DESCRIBE SPEC: the DDL is a
    metadata-only commit, subsequent INSERTs lay files out by the spec,
    and the recorded tuples drive the planner (correctness asserted
    against the unpruned head)."""
    from telemetry_parquet_spark.sources.scan_planner import Eq
    from telemetry_parquet_spark.sources.snapshots import (
        latest_version,
        plan_snapshot_scan,
    )

    root = str(tmp_path / "spec_tbl")
    orders = _orders(spark, sf_dir)
    append(spark, root, orders.where(F.col("o_orderkey") % 2 == 0))
    t = {"t": root}
    out = engine_sql(
        spark,
        "ALTER TABLE t SET PARTITION SPEC "
        "(bucket(8, o_custkey), day(o_orderdate))",
        t,
    ).first()
    assert out.action == "set-spec:2_fields"
    m = read_manifest(root, latest_version(root))
    assert m["action"] == "set-spec"
    assert [f["transform"] for f in m["partition_spec"]["fields"]] == [
        "bucket", "day",
    ]
    desc = engine_sql(spark, "DESCRIBE SPEC t", t).collect()
    assert [(r.column, r.transform, r.n) for r in desc] == [
        ("o_custkey", "bucket", 8), ("o_orderdate", "day", None),
    ]
    # a post-spec append writes under the spec
    append(spark, root, orders.where(F.col("o_orderkey") % 2 == 1))
    m2 = read_manifest(root, latest_version(root))
    assert m2.get("partitions"), "spec append recorded no tuples"
    probe = orders.agg(F.min("o_custkey").alias("k")).first().k
    pruned, plan = plan_snapshot_scan(
        spark, root, [Eq("o_custkey", int(probe))]
    )
    assert any(n == "spec:o_custkey" for n, _ in plan.steps)
    assert (
        pruned.count()
        == orders.where(F.col("o_custkey") == probe).count()
    )
    # DESCRIBE PARTITIONS: one row per live tuple plus an explicit
    # "(untupled)" row for the pre-spec files (never silently omitted);
    # row/byte totals come from the manifest
    parts = engine_sql(spark, "DESCRIBE PARTITIONS t", t).collect()
    assert {r.spec_id for r in parts} == {-1, 1}
    tupled = [r for r in parts if r.spec_id == 1]
    assert sum(r.n_rows for r in tupled) == sum(
        m2["rows"][f] for f in m2["partitions"]
    )
    assert all(r.n_files >= 1 and r.bytes > 0 for r in parts)
    untupled = next(r for r in parts if r.spec_id == -1)
    assert untupled.partition == "(untupled)" and untupled.n_rows > 0
    # DROP PARTITION SPEC is symmetric: current spec cleared, history
    # (and existing files' tuples) retained
    out2 = engine_sql(spark, "ALTER TABLE t DROP PARTITION SPEC", t).first()
    assert out2.action == "drop-spec"
    head = read_manifest(root, latest_version(root))
    assert not head.get("partition_spec")
    assert head.get("specs") and head.get("partitions")
    assert engine_sql(spark, "DESCRIBE SPEC t", t).count() == 0


def test_set_partition_spec_rejects_spurious_n(spark, sf_dir, tmp_path):
    """day(8, ts) / identity(8, c) must error loudly at parse time, not
    silently record a meaningless n in the committed spec."""
    root = str(tmp_path / "badspec")
    append(spark, root, _orders(spark, sf_dir).limit(100))
    t = {"t": root}
    for stmt in (
        "ALTER TABLE t SET PARTITION SPEC (day(8, o_orderdate))",
        "ALTER TABLE t SET PARTITION SPEC (identity(8, o_custkey))",
        "ALTER TABLE t SET PARTITION SPEC (hour(4, o_orderdate))",
    ):
        with pytest.raises(ValueError, match="takes no n"):
            engine_sql(spark, stmt, t)
    # nothing committed by the rejected statements
    from telemetry_parquet_spark.sources.snapshots import latest_version

    assert read_manifest(root, latest_version(root))["action"] == "append"
