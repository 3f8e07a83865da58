"""Property-based tests for the round-13 machinery, checked against
pure-Python references on randomized inputs (the test_properties.py
discipline): (1) an eq-ROUTED SQL DELETE must produce exactly the same
surviving row set as the COW route for every in-shape predicate —
routing is an optimization, never a semantics change; (2) BY-SOURCE
merge clause routing (delete/update, ordered, conditional) against a
reference that applies SQL MERGE semantics row by row."""

from __future__ import annotations

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),            # k
        st.sampled_from(["a", "b", "c", "05", "5"]),      # cat
        st.integers(min_value=-5, max_value=5),           # v
    ),
    min_size=1, max_size=12,
)

eq_conjs = st.lists(
    st.one_of(
        st.tuples(st.just("k"), st.lists(
            st.integers(min_value=0, max_value=6),
            min_size=1, max_size=3, unique=True)),
        st.tuples(st.just("cat"), st.lists(
            st.sampled_from(["a", "b", "05", "5"]),
            min_size=1, max_size=2, unique=True)),
    ),
    min_size=1, max_size=2,
    unique_by=lambda c: c[0],
)


@SLOW
@given(data=rows, conjs=eq_conjs)
def test_eq_routed_delete_equals_cow_delete(spark, data, conjs):
    """DELETE routed to a metadata-only equality delete vs the same
    statement on an UNDECLARED twin table (COW route): identical
    surviving multisets, always."""
    from telemetry_parquet_spark.sources import snapshots as S
    from telemetry_parquet_spark.sources.sql_front import engine_sql

    where = " AND ".join(
        f"{c} = {v[0] if c == 'k' else repr(v[0])}"
        if len(v) == 1
        else f"{c} IN ({', '.join(str(x) if c == 'k' else repr(x) for x in v)})"
        for c, v in conjs
    )
    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(data, "k int, cat string, v int")
        ra, rb = os.path.join(d, "a"), os.path.join(d, "b")
        S.append(spark, ra, df)
        S.append(spark, rb, df)
        S.set_eq_delete_cols(ra, ["k", "cat"])
        out = engine_sql(spark, f"DELETE FROM t WHERE {where}",
                         {"t": ra}).first()
        assert out["action"] == "delete-eq", (where, out)
        engine_sql(spark, f"DELETE FROM t WHERE {where}", {"t": rb})
        got_eq = sorted(tuple(r) for r in S.read_snapshot(spark, ra).collect())
        got_cow = sorted(tuple(r) for r in S.read_snapshot(spark, rb).collect())
        assert got_eq == got_cow, where


_BS_CONDS = {
    None: lambda t: True,
    "t.v > 0": lambda t: t[2] > 0,
    "t.v < 0": lambda t: t[2] < 0,
    "t.k % 2 = 0": lambda t: t[0] % 2 == 0,
}

bs_clauses = st.lists(
    st.one_of(
        st.tuples(st.just("delete"),
                  st.sampled_from(sorted(_BS_CONDS, key=str))),
        st.tuples(st.just("update"),
                  st.sampled_from(sorted(_BS_CONDS, key=str)),
                  st.just({"v": "t.v + 100"})),
    ),
    min_size=1, max_size=3,
)

keyed_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-5, max_value=5),
    ),
    min_size=1, max_size=10,
    unique_by=lambda r: r[0],
)


@SLOW
@given(tgt=keyed_rows, src=keyed_rows, cl=bs_clauses, upd=st.booleans())
def test_by_source_matches_python_reference(spark, tgt, src, cl, upd):
    """BY-SOURCE routing vs the row-by-row SQL MERGE reference:
    matched rows update (or carry), unmatched-by-source rows take the
    FIRST satisfied BY-SOURCE clause, others carry."""
    from telemetry_parquet_spark.sources import snapshots as S

    src_by_k = {r[0]: r for r in src}

    def reference():
        out = []
        for t in tgt:
            s = src_by_k.get(t[0])
            if s is not None:
                out.append(s if upd else t)
                continue
            fired = None
            for clause in cl:
                if _BS_CONDS[clause[1]](t):
                    fired = clause
                    break
            if fired is None:
                out.append(t)
            elif fired[0] == "delete":
                pass
            else:
                out.append((t[0], t[1], t[2] + 100))
        return sorted(out)

    with tempfile.TemporaryDirectory() as d:
        root = os.path.join(d, "t")
        S.append(spark, root, spark.createDataFrame(
            tgt, "k int, cat string, v int"))
        v = S.merge_into_conditional(
            spark, root,
            spark.createDataFrame(src, "k int, cat string, v int"),
            ["k"],
            [("update", None)] if upd else [],
            not_matched_insert=False,
            by_source_clauses=cl,
        )
        got = sorted(
            tuple(r) for r in S.read_snapshot(spark, root, v).collect()
        )
        assert got == reference(), (tgt, src, cl, upd)
