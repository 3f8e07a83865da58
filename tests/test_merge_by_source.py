"""MERGE … WHEN NOT MATCHED BY SOURCE (snapshots.merge_into_conditional
``by_source_clauses`` + the SQL front door grammar).

The set-difference side of SQL MERGE: target rows whose key is absent
from the source — the canonical "sync table to snapshot" shape, and the
set-difference analog of the reference's dedup-prune lineage
(``PioneerOnlineNewsDedupe.scala:114-121`` drops stale prior-state rows
absent from the fresh batch). Pins: delete/update routing, ordered
first-match-wins, t-only scope (source refs fail loudly), assignment
casts, the file-granular detection FLIP (key-range pruning is invalid
for BY-SOURCE — files outside the source envelope are the candidates;
unfired files still carry by reference), and the refusal matrix
(equality-delete interplay, UPDATE SET * without a source row)."""

from __future__ import annotations

import pytest

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.sql_front import engine_sql


def _mk(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    S.append(spark, root, spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k int, name string, ts int",
    ))
    return root


def _state(spark, root, v=None):
    return {tuple(r) for r in S.read_snapshot(spark, root, v).collect()}


def test_sync_to_snapshot(spark, tmp_path):
    """The canonical shape: matched update + not-matched insert +
    by-source delete makes the table exactly equal the source."""
    root = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "B", 200), (5, "e", 50)], "k int, name string, ts int")
    v = S.merge_into_conditional(
        spark, root, src, ["k"], [("update", None)],
        not_matched_insert=True,
        by_source_clauses=[("delete", None)],
    )
    assert _state(spark, root, v) == {(2, "B", 200), (5, "e", 50)}
    # pre-merge version still readable (time travel)
    assert len(_state(spark, root, 1)) == 4


def test_conditional_delete_and_update_first_match_wins(spark, tmp_path):
    root = _mk(spark, tmp_path)
    src = spark.createDataFrame([(1, "A", 100)], "k int, name string, ts int")
    v = S.merge_into_conditional(
        spark, root, src, ["k"], [],
        not_matched_insert=False,
        by_source_clauses=[
            ("update", "t.ts >= 30",
             {"name": "concat(t.name, '!')", "ts": "t.ts * 2"}),
            ("delete", "t.ts < 15"),
        ],
    )
    # k=1 matched (no matched clauses: carries); k=2 unmatched, fires
    # neither (20 not >=30, not <15): carries; k=3/k=4 fire the update
    assert _state(spark, root, v) == {
        (1, "a", 10), (2, "b", 20), (3, "c!", 60), (4, "d!", 80)
    }


def test_clause_order_matters(spark, tmp_path):
    """Opposite order: the unconditional delete shadows the update."""
    root = _mk(spark, tmp_path)
    src = spark.createDataFrame([(1, "A", 100)], "k int, name string, ts int")
    v = S.merge_into_conditional(
        spark, root, src, ["k"], [],
        not_matched_insert=False,
        by_source_clauses=[
            ("delete", None),
            ("update", None, {"ts": "t.ts * 2"}),
        ],
    )
    assert _state(spark, root, v) == {(1, "a", 10)}


def test_null_condition_means_not_satisfied(spark, tmp_path):
    """SQL three-valued logic on the BY-SOURCE side too."""
    root = str(tmp_path / "n")
    S.append(spark, root, spark.createDataFrame(
        [(1, None, 10)], "k int, name string, ts int"))
    src = spark.createDataFrame([(9, "x", 1)], "k int, name string, ts int")
    v = S.merge_into_conditional(
        spark, root, src, ["k"], [], not_matched_insert=False,
        by_source_clauses=[("delete", "t.name = 'a'")],  # NULL = 'a' → NULL
    )
    assert _state(spark, root, v) == {(1, None, 10)}


def test_assignment_cast_keeps_table_schema(spark, tmp_path):
    """Assignments cast to the declared column type — MERGE never
    evolves the schema on the conditional path."""
    root = _mk(spark, tmp_path)
    src = spark.createDataFrame([(1, "A", 1)], "k int, name string, ts int")
    v = S.merge_into_conditional(
        spark, root, src, ["k"], [], not_matched_insert=False,
        # t.ts * 2.5 is DOUBLE; the column stays int
        by_source_clauses=[("update", None, {"ts": "t.ts * 2.5"})],
    )
    df = S.read_snapshot(spark, root, v)
    assert dict(df.dtypes)["ts"] == "int"
    assert _state(spark, root, v) == {
        (1, "a", 10), (2, "b", 50), (3, "c", 75), (4, "d", 100)
    }


def test_detection_flip_reaches_outside_source_envelope(spark, tmp_path):
    """The at-scale property the verdict names: key-range pruning is
    INVALID for BY-SOURCE — a file wholly OUTSIDE the source's key
    envelope (which matched-clause detection would prune) must still be
    detected and rewritten, while an outside file whose rows fire no
    clause carries by reference."""
    root = str(tmp_path / "d")
    S.append(spark, root, spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, name string, ts int"
    ).coalesce(1))
    files_1 = set(S.read_manifest(root, 1)["files"])
    S.append(spark, root, spark.createDataFrame(
        [(100, "x", 5), (101, "y", 7)], "k int, name string, ts int"
    ).coalesce(1))
    files_2 = set(S.read_manifest(root, 2)["files"]) - files_1
    # source envelope covers only k∈[1,2]; the k∈[100,101] file is
    # outside it, but holds BY-SOURCE rows that fire (ts < 10)
    src = spark.createDataFrame(
        [(1, "a2", 99), (2, "b2", 98)], "k int, name string, ts int")
    v = S.merge_into_conditional(
        spark, root, src, ["k"], [("update", None)],
        not_matched_insert=False,
        by_source_clauses=[("delete", "t.ts < 10")],
    )
    after = set(S.read_manifest(root, v)["files"])
    assert not (files_2 & after), "outside-envelope file not rewritten"
    # both k=100 (ts=5) and k=101 (ts=7) fire the delete
    assert _state(spark, root, v) == {(1, "a2", 99), (2, "b2", 98)}


def test_unfired_files_carry_by_reference(spark, tmp_path):
    """A file with NO firing row (all keys matched by the source, or
    unmatched rows failing every condition) is never rewritten."""
    root = str(tmp_path / "c")
    S.append(spark, root, spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, name string, ts int"
    ).coalesce(1))
    files_1 = set(S.read_manifest(root, 1)["files"])
    S.append(spark, root, spark.createDataFrame(
        [(3, "c", 30)], "k int, name string, ts int").coalesce(1))
    files_2 = set(S.read_manifest(root, 2)["files"]) - files_1
    # file 1's keys are all in the source (no BY-SOURCE rows at all);
    # file 2's k=3 is unmatched but ts=30 fails the condition
    src = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, name string, ts int")
    v = S.merge_into_conditional(
        spark, root, src, ["k"], [], not_matched_insert=False,
        by_source_clauses=[("delete", "t.ts > 100")],
    )
    after = set(S.read_manifest(root, v)["files"])
    assert files_1 <= after and files_2 <= after, (
        "no clause fired anywhere — everything must carry by reference"
    )
    assert _state(spark, root, v) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30)
    }


def test_source_reference_fails_loudly(spark, tmp_path):
    """BY-SOURCE conditions see alias t ONLY — an s.* reference is an
    analysis error at detection time, never a silent NULL no-op."""
    root = _mk(spark, tmp_path)
    src = spark.createDataFrame([(1, "A", 1)], "k int, name string, ts int")
    with pytest.raises(Exception, match="s.ts|UNRESOLVED|resolve"):
        S.merge_into_conditional(
            spark, root, src, ["k"], [], not_matched_insert=False,
            by_source_clauses=[("delete", "s.ts > t.ts")],
        )


def test_refusal_matrix(spark, tmp_path):
    root = _mk(spark, tmp_path)
    src = spark.createDataFrame([(1, "A", 1)], "k int, name string, ts int")
    # equality-delete interplay: BY-SOURCE rewrites files from raw
    # bytes, which would resurrect eq-deleted rows — refuse loudly
    S.delete_eq(spark, root, spark.createDataFrame([(2,)], "k int"))
    with pytest.raises(ValueError, match="equality deletes"):
        S.merge_into_conditional(
            spark, root, src, ["k"], [], not_matched_insert=False,
            by_source_clauses=[("delete", None)],
        )
    root2 = _mk(spark, tmp_path, "t2")
    # malformed clause tuples
    for bad in (
        [("upsert", None)],
        [("update", None)],               # update without assignments
        [("update", None, {})],           # empty assignment dict
        [("delete", None, {"a": "1"})],   # delete with assignments
    ):
        with pytest.raises(ValueError):
            S.merge_into_conditional(
                spark, root2, src, ["k"], [], not_matched_insert=False,
                by_source_clauses=bad,
            )
    # unknown assigned column
    with pytest.raises(ValueError, match="unknown column"):
        S.merge_into_conditional(
            spark, root2, src, ["k"], [], not_matched_insert=False,
            by_source_clauses=[("update", None, {"nope": "1"})],
        )
    # no clauses anywhere is still loud
    with pytest.raises(ValueError, match="no clauses"):
        S.merge_into_conditional(
            spark, root2, src, ["k"], [], not_matched_insert=False,
            by_source_clauses=[],
        )


def test_sql_grammar_variants(spark, tmp_path):
    """Fuzz the clause grammar: case/whitespace variants, interleaved
    clause kinds, function calls with commas inside assignments."""
    root = _mk(spark, tmp_path)
    tables = {"t": root}
    engine_sql(spark, """
        merge into t using (select 2 as k, 'B' as name, 200 as ts) on k
        when   matched   then update set *
        WHEN NOT MATCHED by source AND t.ts >= 30 THEN delete
        when not matched THEN INSERT *
        when not  matched  BY  SOURCE then
          UPDATE SET name = concat_ws('-', t.name, 'kept'), ts = t.ts + 1
    """, tables)
    assert _state(spark, root) == {
        (1, "a-kept", 11), (2, "B", 200)
    }


def test_sql_by_source_loud_errors(spark, tmp_path):
    root = _mk(spark, tmp_path)
    tables = {"t": root}
    sub = "(SELECT 1 AS k, 'x' AS name, 1 AS ts)"
    with pytest.raises(ValueError, match="UPDATE SET \\*"):
        engine_sql(spark, f"MERGE INTO t USING {sub} ON k "
                   "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *", tables)
    with pytest.raises(ValueError, match="WHEN MATCHED supports only"):
        engine_sql(spark, f"MERGE INTO t USING {sub} ON k "
                   "WHEN MATCHED THEN UPDATE SET ts = 1", tables)
    with pytest.raises(ValueError, match="cannot parse SET assignment"):
        engine_sql(spark, f"MERGE INTO t USING {sub} ON k "
                   "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET ts + 1",
                   tables)
    with pytest.raises(ValueError, match="assigned twice"):
        engine_sql(spark, f"MERGE INTO t USING {sub} ON k "
                   "WHEN NOT MATCHED BY SOURCE THEN "
                   "UPDATE SET ts = 1, ts = 2", tables)
    with pytest.raises(ValueError, match="cannot parse clause tail"):
        engine_sql(spark, f"MERGE INTO t USING {sub} ON k "
                   "WHEN NOT MATCHED BY SOURCE THEN TRUNCATE", tables)
    # INSERT never belongs to BY SOURCE
    with pytest.raises(ValueError, match="BY SOURCE"):
        engine_sql(spark, f"MERGE INTO t USING {sub} ON k "
                   "WHEN NOT MATCHED BY SOURCE THEN INSERT *", tables)


def test_column_object_condition(spark, tmp_path):
    """BY-SOURCE conditions may be Column objects, same as matched
    clauses (review finding: detection crashed with TypeError on
    F.expr(Column)). Like matched-clause Column conditions, references
    must be t-qualified — both sides of the rewrite join are in scope."""
    from pyspark.sql import functions as F

    root = _mk(spark, tmp_path, "colcond")
    src = spark.createDataFrame([(1, "A", 100)], "k int, name string, ts int")
    v = S.merge_into_conditional(
        spark, root, src, ["k"], [], not_matched_insert=False,
        by_source_clauses=[("delete", F.col("t.ts") < 25)],
    )
    assert _state(spark, root, v) == {
        (1, "a", 10), (3, "c", 30), (4, "d", 40)
    }


def test_explain_reports_merge_clause_shape(spark, tmp_path):
    """EXPLAIN MERGE reports the clause census and the detection shape
    (BY-SOURCE flips to the all-files pass) from the statement alone —
    nothing executes."""
    from telemetry_parquet_spark.sources.sql_front import explain_sql

    root = _mk(spark, tmp_path, "ex")
    tables = {"t": root}
    v_before = S.latest_version(root)
    rows = {
        r["aspect"]: r["detail"]
        for r in explain_sql(spark, """
            MERGE INTO t USING (SELECT 1 AS k, 'x' AS name, 1 AS ts)
            ON k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            WHEN NOT MATCHED BY SOURCE THEN DELETE
        """, tables).collect()
    }
    assert rows["merge_clauses"] == (
        "1 matched, 1 not-matched, 1 not-matched-by-source")
    assert "all-files anti-join" in rows["merge_detection"]
    assert S.latest_version(root) == v_before  # nothing committed
    rows2 = {
        r["aspect"]: r["detail"]
        for r in explain_sql(spark, """
            MERGE INTO t USING (SELECT 1 AS k, 'x' AS name, 1 AS ts)
            ON k WHEN MATCHED AND s.ts > t.ts THEN UPDATE SET *
        """, tables).collect()
    }
    assert "key envelope" in rows2["merge_detection"]
