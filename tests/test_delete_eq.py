"""Equality deletes (sources/snapshots.py::delete_eq + _read_logical):
the other half of the Iceberg v2 delete contract. Pins: scope semantics
(rows appended AFTER the delete are untouched), stacking with position
vectors, exact metadata row counts, CDC interplay, compaction
materialization, and the loud refusal matrix (COW mutators, metadata
aggregates, branches, staging, NULL keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S


def _mk(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    S.append(spark, root, spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30), (4, "c", 40)],
        "k int, cat string, v int",
    ))
    return root


def _state(spark, root, v=None):
    return {tuple(r) for r in S.read_snapshot(spark, root, v).collect()}


def test_basic_eq_delete_and_scope(spark, tmp_path):
    root = _mk(spark, tmp_path)
    vals = spark.createDataFrame([("a",)], "cat string")
    v2 = S.delete_eq(spark, root, vals)
    assert _state(spark, root, v2) == {(2, "b", 20), (4, "c", 40)}
    # time travel: v1 unchanged
    assert len(_state(spark, root, 1)) == 4
    # the SEQUENCE rule: rows appended AFTER the delete are untouched,
    # even with matching keys
    v3 = S.append(spark, root, spark.createDataFrame(
        [(9, "a", 90)], "k int, cat string, v int"))
    assert _state(spark, root, v3) == {
        (2, "b", 20), (4, "c", 40), (9, "a", 90)
    }
    # exact metadata row count through the whole chain — no scan
    assert S.snapshot_row_count(root, v2) == 2
    assert S.snapshot_row_count(root, v3) == 3


def test_stacked_eq_and_position_vectors(spark, tmp_path):
    """eq → MOR position delete → eq: counts never double-subtract
    because each vector is computed on the logical view."""
    root = _mk(spark, tmp_path)
    S.delete_eq(spark, root, spark.createDataFrame([("a",)], "cat string"))
    S.delete_where_mor(spark, root, "v >= 20")  # masks only live rows
    v4 = S.delete_eq(
        spark, root, spark.createDataFrame([(2,)], "k int")
    )
    assert _state(spark, root, v4) == set()
    assert S.snapshot_row_count(root, v4) == 0
    m = S.read_manifest(root, v4)
    # first eq masked 2 (cat='a': k=1, k=3); the MOR delete then masked
    # the 2 surviving rows (k=2, k=4); the second eq therefore matched
    # NOTHING (k=2 already position-masked) — stacked vectors never
    # overlap, so 4 - 2(dv) - (2+0)(eq) = 0 stays exact
    assert [e["matched"] for e in m["eq"]] == [2, 0]


def test_compaction_materializes_eq(spark, tmp_path):
    root = _mk(spark, tmp_path)
    S.delete_eq(spark, root, spark.createDataFrame([("a",)], "cat string"))
    v3 = S.compact_table(spark, root, target_bytes=1 << 26)
    m = S.read_manifest(root, v3)
    assert not m.get("eq") and not m.get("dv")
    assert _state(spark, root, v3) == {(2, "b", 20), (4, "c", 40)}
    # CDC: the materializing compaction cancels to EMPTY
    assert S.table_changes(spark, root, 2, v3).count() == 0


def test_cdc_sees_eq_delete_exactly(spark, tmp_path):
    root = _mk(spark, tmp_path)
    v2 = S.delete_eq(
        spark, root, spark.createDataFrame([("a",)], "cat string")
    )
    ch = S.table_changes(spark, root, 1, v2).collect()
    assert sorted((r.k, r._change) for r in ch) == [
        (1, "delete"), (3, "delete")
    ]


def test_plan_scan_and_filtered_reads_apply_eq(spark, tmp_path):
    from telemetry_parquet_spark.sources.scan_planner import Range

    root = _mk(spark, tmp_path)
    S.delete_eq(spark, root, spark.createDataFrame([("a",)], "cat string"))
    # MOR state is refused by default (the documented contract);
    # allow_dv reads through BOTH vector kinds
    with pytest.raises(ValueError, match="equality deletes"):
        S.plan_snapshot_scan(spark, root, [Range("v", 0, 35)])
    df, _plan = S.plan_snapshot_scan(
        spark, root, [Range("v", 0, 35)], allow_dv=True
    )
    assert {tuple(r) for r in df.collect()} == {(2, "b", 20)}


def test_metadata_aggregates_refuse_under_eq(spark, tmp_path):
    root = _mk(spark, tmp_path)
    S.delete_eq(spark, root, spark.createDataFrame([("a",)], "cat string"))
    assert S.snapshot_minmax(root, "v") is None
    assert S.snapshot_sum(root, "v") is None
    assert S.snapshot_filtered_agg(root, "cat", "b") is None
    assert S.snapshot_groupby_metadata(root, ["cat"]) is None


def test_refusal_matrix(spark, tmp_path):
    root = _mk(spark, tmp_path)
    S.delete_eq(spark, root, spark.createDataFrame([("a",)], "cat string"))
    with pytest.raises(ValueError, match="equality deletes"):
        S.delete_where(spark, root, "v = 20")
    with pytest.raises(ValueError, match="equality deletes"):
        S.merge_into(
            spark, root,
            spark.createDataFrame([(2, "b", 99)], "k int, cat string, v int"),
            ["k"],
        )
    with pytest.raises(ValueError, match="equality deletes"):
        S.stage_delete_mor(spark, root, "v = 20", "w1")
    from telemetry_parquet_spark.sources.branches import create_branch

    with pytest.raises(ValueError, match="equality deletes"):
        create_branch(root, "b1")
    # NULL key values refused loudly
    with pytest.raises(ValueError, match="NULL key"):
        S.delete_eq(
            spark, root,
            spark.createDataFrame([(None,)], "cat string"),
        )
    # non-table column refused
    with pytest.raises(ValueError, match="not a table column"):
        S.delete_eq(
            spark, root, spark.createDataFrame([(1,)], "nope int")
        )


def test_composite_key_eq_delete(spark, tmp_path):
    root = _mk(spark, tmp_path)
    v2 = S.delete_eq(
        spark, root,
        spark.createDataFrame([("a", 10), ("c", 40)], "cat string, v int"),
    )
    assert _state(spark, root, v2) == {(2, "b", 20), (3, "a", 30)}
    assert S.snapshot_row_count(root, v2) == 2


def test_unique_probe_sees_eq_masks(spark, tmp_path):
    """A key masked by an eq delete is logically absent: re-inserting it
    must pass the UNIQUE gate."""
    root = str(tmp_path / "u")
    S.append(spark, root, spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, cat string"))
    S.add_unique_constraint(spark, root, "pk", ["k"])
    S.delete_eq(spark, root, spark.createDataFrame([(1,)], "k int"))
    v = S.append(spark, root, spark.createDataFrame(
        [(1, "z")], "k int, cat string"))
    assert _state(spark, root, v) == {(1, "z"), (2, "b")}


def test_wap_publish_carries_eq_and_preview_applies_it(spark, tmp_path):
    """publish of a staged APPEND must carry the head's outstanding eq
    (staged files postdate every scope) and the audited preview must
    already apply the masks — an audit validating resurrected rows is
    a wrong gate."""
    root = _mk(spark, tmp_path, "w")
    S.delete_eq(spark, root, spark.createDataFrame([("a",)], "cat string"))
    S.stage_append(
        spark, root,
        spark.createDataFrame([(9, "a", 90)], "k int, cat string, v int"),
        "w1",
    )
    preview = {tuple(r) for r in S.read_staged(spark, root, "w1").collect()}
    assert preview == {(2, "b", 20), (4, "c", 40), (9, "a", 90)}
    v = S.publish_staged(spark, root, "w1")
    m = S.read_manifest(root, v)
    assert m.get("eq"), "publish dropped the outstanding equality delete"
    assert _state(spark, root, v) == {
        (2, "b", 20), (4, "c", 40), (9, "a", 90)
    }
    assert S.snapshot_row_count(root, v) == 3


def test_drop_column_refuses_eq_key(spark, tmp_path):
    root = _mk(spark, tmp_path, "dc")
    S.delete_eq(spark, root, spark.createDataFrame([("a",)], "cat string"))
    with pytest.raises(ValueError, match="outstanding equality"):
        S.alter_drop_column(root, "cat")
    # non-key columns still droppable; reads stay healthy
    v = S.alter_drop_column(root, "v")
    assert _state(spark, root, v) == {(2, "b"), (4, "c")}


def test_empty_key_set_is_a_noop(spark, tmp_path):
    """A delete batch that filtered to zero rows must NOT commit a
    degenerate eq entry: that would flip the table into eq-refusal mode
    (metadata aggregates refuse, COW mutators raise) until a full
    compaction. The call returns the parent version untouched."""
    root = _mk(spark, tmp_path)
    parent = S.latest_version(root)
    empty = spark.createDataFrame([], "cat string")
    v = S.delete_eq(spark, root, empty)
    assert v == parent
    assert S.latest_version(root) == parent  # no commit at all
    m = S.read_manifest(root, parent)
    assert not m.get("eq")
    # the table's operational mode is intact: metadata aggregates work
    assert S.snapshot_row_count(root, parent) == 4
    assert _state(spark, root, parent) == {
        (1, "a", 10), (2, "b", 20), (3, "a", 30), (4, "c", 40)
    }


# ---- SQL DELETE → equality-delete routing (sql_front._probe_eq_delete) ----


def _route_setup(spark, tmp_path, declare=("k", "cat"), name="rt"):
    from telemetry_parquet_spark.sources.sql_front import engine_sql

    root = _mk(spark, tmp_path, name)
    tables = {"t": root}
    if declare:
        engine_sql(
            spark,
            "ALTER TABLE t SET EQUALITY DELETE COLUMNS "
            f"({', '.join(declare)})",
            tables,
        )
    return root, tables


def test_sql_delete_routes_to_eq(spark, tmp_path):
    """An eq-shaped DELETE over declared columns commits a key-set
    file: action delete-eq, manifest file list BYTE-IDENTICAL."""
    from telemetry_parquet_spark.sources.sql_front import engine_sql

    root, tables = _route_setup(spark, tmp_path)
    before = S.read_manifest(root, S.latest_version(root))["files"]
    out = engine_sql(spark, "DELETE FROM t WHERE k IN (1, 3)", tables).first()
    assert out["action"] == "delete-eq"
    m = S.read_manifest(root, out["version"])
    assert m["files"] == before and len(m["eq"]) == 1
    assert _state(spark, root) == {(2, "b", 20), (4, "c", 40)}
    # composite tuple over both declared columns, typed cast (int+str)
    out = engine_sql(
        spark, "DELETE FROM t WHERE cat = 'c' AND k = 4", tables
    ).first()
    assert out["action"] == "delete-eq"
    assert S.read_manifest(root, out["version"])["files"] == before
    assert _state(spark, root) == {(2, "b", 20)}


def test_sql_delete_cow_fallbacks(spark, tmp_path):
    """Every non-eq shape keeps the copy-on-write route: undeclared
    column, range/OR predicates, duplicate conjunct column, NULL
    literal, no declaration, no WHERE at all."""
    from telemetry_parquet_spark.sources.sql_front import (
        _probe_eq_delete,
        engine_sql,
    )

    root, tables = _route_setup(spark, tmp_path)
    for where in (
        "v = 10",                 # undeclared column
        "k > 2",                  # range
        "k = 1 OR k = 2",         # disjunction (parser refuses)
        "k = 1 AND k = 2",        # duplicated column
        "cat = 'a' AND v = 10",   # one declared, one not
        "upper(cat) = 'A'",       # function
    ):
        assert _probe_eq_delete(root, where) is None, where
    # a genuinely COW-routed delete still works end-to-end
    out = engine_sql(spark, "DELETE FROM t WHERE v >= 40", tables).first()
    assert out["action"] == "delete"
    assert _state(spark, root) == {(1, "a", 10), (2, "b", 20), (3, "a", 30)}
    # undeclared table: probe never routes
    root2, tables2 = _route_setup(spark, tmp_path, declare=None, name="rt2")
    from telemetry_parquet_spark.sources.sql_front import _probe_eq_delete as p
    assert p(root2, "k = 1") is None
    out = engine_sql(spark, "DELETE FROM t2 WHERE k = 1",
                     {"t2": root2}).first()
    assert out["action"] == "delete"


def test_eq_delete_cross_product_cap(spark, tmp_path):
    """IN × IN key sets beyond the cap fall back to COW (a broadcast
    key batch must stay small by design)."""
    import telemetry_parquet_spark.sources.sql_front as SF

    root, tables = _route_setup(spark, tmp_path)
    probe = SF._probe_eq_delete(root, "k IN (1, 2) AND cat IN ('a', 'b')")
    assert probe is not None and len(probe[1]) == 4
    old = SF._EQ_DELETE_MAX_TUPLES
    SF._EQ_DELETE_MAX_TUPLES = 3
    try:
        assert SF._probe_eq_delete(
            root, "k IN (1, 2) AND cat IN ('a', 'b')") is None
    finally:
        SF._EQ_DELETE_MAX_TUPLES = old


def test_explain_reports_eq_route(spark, tmp_path):
    from telemetry_parquet_spark.sources.sql_front import explain_sql

    root, tables = _route_setup(spark, tmp_path)
    rows = {
        r["aspect"]: r["detail"]
        for r in explain_sql(
            spark, "DELETE FROM t WHERE k IN (1, 3)", tables
        ).collect()
    }
    assert "equality-delete" in rows["route"]
    assert "2 key tuple(s) over (k)" in rows["statement"]
    cow = {
        r["aspect"]: r["detail"]
        for r in explain_sql(
            spark, "DELETE FROM t WHERE v > 5", tables
        ).collect()
    }
    assert "equality-delete" not in cow["route"]
    assert "copy-on-write" in cow["statement"]


def test_eq_delete_cols_declaration(spark, tmp_path):
    """Declaration DDL: validates columns, survives later commits and
    compaction (capability, not state), clears with an empty list."""
    root = _mk(spark, tmp_path, "decl")
    with pytest.raises(ValueError, match="not in table schema"):
        S.set_eq_delete_cols(root, ["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        S.set_eq_delete_cols(root, ["k", "k"])
    v = S.set_eq_delete_cols(root, ["k"])
    assert S.read_manifest(root, v)["eq_delete_cols"] == ["k"]
    S.append(spark, root, spark.createDataFrame(
        [(9, "z", 90)], "k int, cat string, v int"))
    assert S.read_manifest(
        root, S.latest_version(root))["eq_delete_cols"] == ["k"]
    v = S.compact_table(spark, root, target_bytes=1 << 20)
    assert S.read_manifest(root, v)["eq_delete_cols"] == ["k"]
    v = S.set_eq_delete_cols(root, [])
    assert "eq_delete_cols" not in S.read_manifest(root, v)


def test_eq_route_literal_type_gate(spark, tmp_path):
    """A literal whose python type is outside the declared column's
    type class must NOT route: the eq tuple would string/number-match a
    DIFFERENT row set than Spark's own coercion on the COW path (review
    finding: `cat = 5` on a string column deleted only '5', not '05')."""
    from telemetry_parquet_spark.sources.sql_front import _probe_eq_delete

    root, tables = _route_setup(spark, tmp_path, name="tg")
    assert _probe_eq_delete(root, "cat = 5") is None        # int on str
    assert _probe_eq_delete(root, "k = 'abc'") is None      # str on int
    assert _probe_eq_delete(root, "k IN (1, 'x')") is None  # mixed IN
    assert _probe_eq_delete(root, "k = 1.5") is None        # float on int
    # proper types still route
    assert _probe_eq_delete(root, "cat = '5'") is not None
    assert _probe_eq_delete(root, "k IN (1, 2)") is not None


def test_drop_column_prunes_eq_declaration(spark, tmp_path):
    """Dropping a declared eq-delete column prunes the declaration so
    EXPLAIN/DELETE stop advertising a route over a nonexistent column
    (review finding: stale declaration crashed with KeyError)."""
    from telemetry_parquet_spark.sources.sql_front import (
        _probe_eq_delete,
        engine_sql,
    )

    root, tables = _route_setup(spark, tmp_path, name="td")
    S.alter_drop_column(root, "cat")
    m = S.read_manifest(root, S.latest_version(root))
    assert m.get("eq_delete_cols") == ["k"]  # cat pruned, k kept
    assert _probe_eq_delete(root, "cat = 'a'") is None
    out = engine_sql(spark, "DELETE FROM t WHERE k = 1",
                     {"t": root}).first()
    assert out["action"] == "delete-eq"  # surviving column still routes
    # dropping the last declared column clears the declaration entirely
    root2, _ = _route_setup(spark, tmp_path, declare=("cat",), name="td2")
    S.alter_drop_column(root2, "cat")
    assert "eq_delete_cols" not in S.read_manifest(
        root2, S.latest_version(root2))


def test_eq_route_exact_semantics_only(spark, tmp_path):
    """Second-review pins: float/decimal/date columns and out-of-range
    integer literals never route — each is a case where the typed key
    tuple would diverge from (or crash where) the COW predicate
    (float32 promotion, decimal cast ROUNDING, cast-to-NULL)."""
    from telemetry_parquet_spark.sources.sql_front import _probe_eq_delete

    root = str(tmp_path / "sem")
    S.append(spark, root, spark.createDataFrame(
        [(1, 0.1, "2024-01-01", 5)],
        "b tinyint, f float, d string, k int").selectExpr(
            "b", "f", "CAST(d AS DATE) AS d", "k"))
    S.set_eq_delete_cols(root, ["b", "f", "d", "k"])
    assert _probe_eq_delete(root, "f = 0.1") is None       # float col
    assert _probe_eq_delete(root, "d = '2024-01-01'") is None  # date col
    assert _probe_eq_delete(root, "b = 999") is None       # out of range
    assert _probe_eq_delete(root, "b = -129") is None
    assert _probe_eq_delete(root, "b = 127") is not None   # in range
    assert _probe_eq_delete(root, "k = 5") is not None


def test_eq_routed_then_cow_refusal_is_loud(spark, tmp_path):
    """Second-review pin for the operational interplay: a routed point
    delete leaves an outstanding key set, so a later COW-shaped DELETE
    through the same front door refuses with the compact_table
    instruction — and EXPLAIN advertised the interplay up front."""
    from telemetry_parquet_spark.sources.sql_front import (
        engine_sql,
        explain_sql,
    )

    root, tables = _route_setup(spark, tmp_path, name="inter")
    rows = {
        r["aspect"]: r["detail"]
        for r in explain_sql(spark, "DELETE FROM t WHERE k = 1",
                             tables).collect()
    }
    assert "refuse until compact_table" in rows["eq_delete_interplay"]
    out = engine_sql(spark, "DELETE FROM t WHERE k = 1", tables).first()
    assert out["action"] == "delete-eq"
    with pytest.raises(ValueError, match="compact_table"):
        engine_sql(spark, "DELETE FROM t WHERE v > 5", tables)
    # compaction restores COW DML
    S.compact_table(spark, root, target_bytes=1 << 20)
    out = engine_sql(spark, "DELETE FROM t WHERE v > 35", tables).first()
    assert out["action"] == "delete"
    assert _state(spark, root) == {(2, "b", 20), (3, "a", 30)}
