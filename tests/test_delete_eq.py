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
