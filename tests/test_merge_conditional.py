"""Conditional MERGE clauses (sources/snapshots.py::merge_into_conditional
+ the SQL front door's WHEN-clause grammar).

The reference's dedup-upsert lineage (PioneerOnlineNewsDedupe.scala:114-121,
keep-newest-by-timestamp) is a ``WHEN MATCHED AND s.ts > t.ts THEN
UPDATE`` merge; these tests pin the clause engine's SQL-standard
semantics: ordered first-match-wins routing, carry-unchanged when no
clause fires, NULL conditions mean not-satisfied, filtered inserts, and
the CLAUSE-AWARE file detection (a file whose matched rows fire nothing
is carried by reference, never rewritten)."""

from __future__ import annotations

import pytest

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.sql_front import engine_sql


def _mk(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    tgt = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k int, name string, ts int",
    )
    S.append(spark, root, tgt)
    return root


def _src(spark):
    return spark.createDataFrame(
        [(2, "B", 25), (3, "Cstale", 5), (4, "del", 99),
         (9, "new", 1), (10, "skip", 0)],
        "k int, name string, ts int",
    )


def _state(spark, root, v=None):
    return {tuple(r) for r in S.read_snapshot(spark, root, v).collect()}


def test_clause_routing_first_match_wins(spark, tmp_path):
    root = _mk(spark, tmp_path)
    v = S.merge_into_conditional(
        spark, root, _src(spark), ["k"],
        [("delete", "s.name = 'del'"), ("update", "s.ts > t.ts")],
        not_matched_insert=True, insert_condition="s.ts > 0",
    )
    assert _state(spark, root, v) == {
        (1, "a", 10),   # unmatched target: carried
        (2, "B", 25),   # matched, update fired (25 > 20)
        (3, "c", 30),   # matched, stale source (5 < 30): carried
        (9, "new", 1),  # unmatched source, insert condition holds
        # k=4 deleted (name='del'); k=10 insert filtered (ts=0)
    }
    # pre-merge version still readable (time travel)
    assert len(_state(spark, root, 1)) == 4


def test_clause_order_matters(spark, tmp_path):
    """Same clauses, opposite order: update-first captures the k=4 row
    (99 > 40) before the delete clause can see it."""
    root = _mk(spark, tmp_path)
    v = S.merge_into_conditional(
        spark, root, _src(spark), ["k"],
        [("update", "s.ts > t.ts"), ("delete", "s.name = 'del'")],
        not_matched_insert=False,
    )
    assert (4, "del", 99) in _state(spark, root, v)


def test_null_condition_means_not_satisfied(spark, tmp_path):
    """SQL three-valued logic: a condition evaluating to NULL does not
    fire the clause — the row carries unchanged."""
    root = str(tmp_path / "n")
    S.append(spark, root, spark.createDataFrame(
        [(1, None, 10)], "k int, name string, ts int"
    ))
    v = S.merge_into_conditional(
        spark, root,
        spark.createDataFrame([(1, None, 99)], "k int, name string, ts int"),
        ["k"], [("update", "t.name = s.name")],  # NULL = NULL -> NULL
        not_matched_insert=False,
    )
    assert _state(spark, root, v) == {(1, None, 10)}


def test_clause_aware_detection_carries_unfired_files(spark, tmp_path):
    """A file whose matched rows fire NO clause must be carried by
    reference (zero rewrite) — the at-scale property: a keep-newest
    merge against a mostly-stale source rewrites almost nothing."""
    root = str(tmp_path / "d")
    S.append(spark, root, spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, name string, ts int"
    ).coalesce(1))
    files_1 = set(S.read_manifest(root, 1)["files"])
    S.append(spark, root, spark.createDataFrame(
        [(3, "c", 30), (4, "d", 40)], "k int, name string, ts int"
    ).coalesce(1))
    files_2 = set(S.read_manifest(root, 2)["files"]) - files_1
    # source matches keys in BOTH appends, but only append 2's row fires
    src = spark.createDataFrame(
        [(1, "stale", 0), (3, "C", 99)], "k int, name string, ts int")
    v = S.merge_into_conditional(
        spark, root, src, ["k"], [("update", "s.ts > t.ts")],
        not_matched_insert=False,
    )
    after = set(S.read_manifest(root, v)["files"])
    # append 1 (k=1 matched but stale, k=2 unmatched): carried intact
    assert files_1 <= after
    # append 2 (k=3 fired): rewritten away
    assert not (files_2 & after)
    assert _state(spark, root, v) == {
        (1, "a", 10), (2, "b", 20), (3, "C", 99), (4, "d", 40)
    }


def test_insert_only_merge(spark, tmp_path):
    """No matched clauses at all: pure conditional INSERT-if-absent —
    zero files rewritten ever."""
    root = _mk(spark, tmp_path)
    before = set(S.read_manifest(root, 1)["files"])
    v = S.merge_into_conditional(
        spark, root, _src(spark), ["k"], [],
        not_matched_insert=True, insert_condition="s.ts >= 1",
    )
    assert before <= set(S.read_manifest(root, v)["files"])
    assert _state(spark, root, v) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40),
        (9, "new", 1),
    }


def test_loud_errors(spark, tmp_path):
    root = _mk(spark, tmp_path)
    src = _src(spark)
    with pytest.raises(ValueError, match="unknown matched action"):
        S.merge_into_conditional(
            spark, root, src, ["k"], [("upsert", None)]
        )
    with pytest.raises(ValueError, match="nothing to do"):
        S.merge_into_conditional(
            spark, root, src, ["k"], [], not_matched_insert=False
        )
    with pytest.raises(ValueError, match="duplicate merge keys"):
        S.merge_into_conditional(
            spark, root, src.unionAll(src), ["k"], [("update", None)]
        )
    with pytest.raises(ValueError, match="source columns"):
        S.merge_into_conditional(
            spark, root, src.drop("ts"), ["k"], [("update", None)]
        )


def test_sql_clause_grammar_variants(spark, tmp_path):
    """UPDATE ALL == UPDATE SET *, case-insensitive keywords, and the
    action column proving the conditional route."""
    src = _src(spark)
    src.createOrReplaceTempView("mc_src")
    results = []
    for stmt in (
        "MERGE INTO t USING (SELECT * FROM mc_src) ON k "
        "WHEN MATCHED AND s.ts > t.ts THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        "merge into t using (select * from mc_src) on k "
        "when matched and s.ts > t.ts then update all "
        "when not matched then insert all;",
    ):
        root = _mk(spark, tmp_path, f"g{len(results)}")
        out = engine_sql(spark, stmt, {"t": root}).first()
        assert out.action == "merge-into-conditional"
        results.append(_state(spark, root))
    assert results[0] == results[1]
    assert (4, "del", 99) in results[0]  # update fired (99 > 40)
    assert (10, "skip", 0) in results[0]  # unconditional insert


def test_sql_loud_clause_errors(spark, tmp_path):
    root = _mk(spark, tmp_path)
    _src(spark).createOrReplaceTempView("mc_src2")
    t = {"t": root}
    head = S.latest_version(root)
    for bad, msg in [
        ("MERGE INTO t USING (SELECT * FROM mc_src2) ON k "
         "WHEN MATCHED THEN INSERT *", "INSERT belongs"),
        ("MERGE INTO t USING (SELECT * FROM mc_src2) ON k "
         "WHEN NOT MATCHED THEN DELETE", "only.*INSERT"),
        ("MERGE INTO t USING (SELECT * FROM mc_src2) ON k "
         "WHEN NOT MATCHED THEN INSERT * "
         "WHEN NOT MATCHED THEN INSERT *", "at most one"),
        ("MERGE INTO t USING (SELECT * FROM mc_src2) ON k "
         "WHEN MATCHED THEN MODIFY *", "cannot parse clause tail"),
    ]:
        with pytest.raises(ValueError, match=msg):
            engine_sql(spark, bad, t)
    assert S.latest_version(root) == head  # nothing committed
