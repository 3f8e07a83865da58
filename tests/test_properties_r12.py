"""Property-based tests for the round-12 machinery: conditional MERGE
clause routing, equality-delete scope semantics under random eq/DV/append
stacks, and the DPP conjunct-parser round-trip — each checked against a
pure-Python reference on randomized inputs (the repo's test_properties.py
discipline)."""

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

_MATCH_CONDS = {
    None: lambda t, s: True,
    "s.ts > t.ts": lambda t, s: s[2] > t[2],
    "s.ts < t.ts": lambda t, s: s[2] < t[2],
    "s.v % 2 = 0": lambda t, s: s[1] % 2 == 0,
    "t.v > 0": lambda t, s: t[1] > 0,
}
_INS_CONDS = {
    None: lambda s: True,
    "s.ts > 0": lambda s: s[2] > 0,
    "s.v % 2 = 0": lambda s: s[1] % 2 == 0,
}

target_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # k
        st.integers(min_value=-5, max_value=5),  # v
        st.integers(min_value=-5, max_value=5),  # ts
    ),
    min_size=1, max_size=10,
    unique_by=lambda r: r[0],
)
clauses = st.lists(
    st.tuples(
        st.sampled_from(["update", "delete"]),
        st.sampled_from(sorted(_MATCH_CONDS, key=str)),
    ),
    min_size=0, max_size=3,
)


@SLOW
@given(
    tgt=target_rows,
    src=target_rows,
    cl=clauses,
    ins=st.booleans(),
    ins_cond=st.sampled_from(sorted(_INS_CONDS, key=str)),
)
def test_merge_conditional_matches_python_reference(
    spark, tgt, src, cl, ins, ins_cond
):
    """merge_into_conditional == the SQL-standard reference: per matched
    pair the FIRST satisfied clause wins (update -> source row, delete
    -> gone, none -> target row unchanged); unmatched targets carry;
    unmatched sources insert iff the insert condition holds."""
    from telemetry_parquet_spark.sources import snapshots as S

    if not cl and not ins:
        return  # the loud nothing-to-do error, covered elsewhere
    root = os.path.join(tempfile.mkdtemp(), "t")
    S.append(spark, root, spark.createDataFrame(
        tgt, "k int, v int, ts int"))
    v = S.merge_into_conditional(
        spark, root,
        spark.createDataFrame(src, "k int, v int, ts int"),
        ["k"], cl, not_matched_insert=ins, insert_condition=ins_cond,
    )
    got = {tuple(r) for r in S.read_snapshot(spark, root, v).collect()}

    by_key = {s[0]: s for s in src}
    want = set()
    for t in tgt:
        s = by_key.get(t[0])
        if s is None:
            want.add(t)
            continue
        fired = None
        for action, cond in cl:
            if _MATCH_CONDS[cond](t, s):
                fired = action
                break
        if fired == "update":
            want.add(s)
        elif fired is None:
            want.add(t)
        # fired == "delete": row gone
    if ins:
        tkeys = {t[0] for t in tgt}
        for s in src:
            if s[0] not in tkeys and _INS_CONDS[ins_cond](s):
                want.add(s)
    assert got == want


ops = st.lists(
    st.one_of(
        st.tuples(st.just("eq"), st.lists(
            st.integers(min_value=0, max_value=9),
            min_size=1, max_size=4, unique=True)),
        st.tuples(st.just("mor"), st.integers(min_value=-5, max_value=5)),
        st.tuples(st.just("append"), st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=-5, max_value=5),
            ),
            min_size=1, max_size=4)),
    ),
    min_size=1, max_size=4,
)


@SLOW
@given(
    base=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=1, max_size=8),
    seq=ops,
)
def test_eq_dv_append_stacks_match_python_reference(spark, base, seq):
    """Random eq-delete / MOR-delete / append stacks: the logical state
    equals a pure-Python simulation applying the SEQUENCE rule (an eq
    delete masks only rows present at its commit), and
    snapshot_row_count stays exact metadata at every step."""
    from telemetry_parquet_spark.sources import snapshots as S

    root = os.path.join(tempfile.mkdtemp(), "t")
    S.append(spark, root, spark.createDataFrame(base, "k int, v int"))
    state = list(base)  # multiset of live rows, in-order
    for kind, arg in seq:
        if kind == "eq":
            S.delete_eq(
                spark, root,
                spark.createDataFrame([(k,) for k in arg], "k int"),
            )
            state = [r for r in state if r[0] not in set(arg)]
        elif kind == "mor":
            S.delete_where_mor(spark, root, f"v = {arg}")
            state = [r for r in state if r[1] != arg]
        else:
            S.append(spark, root, spark.createDataFrame(
                arg, "k int, v int"))
            state.extend(arg)
        got = sorted(
            tuple(r) for r in S.read_snapshot(spark, root).collect()
        )
        assert got == sorted(state)
        assert S.snapshot_row_count(root) == len(state)


@settings(max_examples=200, deadline=None)
@given(
    conj=st.lists(
        st.one_of(
            st.tuples(st.just("eq"), st.sampled_from("abc"),
                      st.integers(-99, 99)),
            st.tuples(st.just("in"), st.sampled_from("abc"),
                      st.lists(st.integers(-99, 99), min_size=1,
                               max_size=3)),
            st.tuples(st.just("between"), st.sampled_from("abc"),
                      st.tuples(st.integers(-99, 99),
                                st.integers(-99, 99))),
            st.tuples(st.just("ge"), st.sampled_from("abc"),
                      st.integers(-99, 99)),
        ),
        min_size=1, max_size=4,
    )
)
def test_conjunct_parser_round_trip(conj):
    """Rendering random conjunct lists to SQL and parsing them back
    yields the same planner predicates."""
    from telemetry_parquet_spark.sources.scan_planner import Eq, In, Range
    from telemetry_parquet_spark.sources.sql_front import _parse_conjuncts

    parts, want = [], []
    for kind, col, val in conj:
        if kind == "eq":
            parts.append(f"{col} = {val}")
            want.append(Eq(col, val))
        elif kind == "in":
            parts.append(f"{col} IN ({', '.join(map(str, val))})")
            want.append(In(col, tuple(val)))
        elif kind == "between":
            lo, hi = val
            parts.append(f"{col} BETWEEN {lo} AND {hi}")
            want.append(Range(col, lo, hi))
        else:
            parts.append(f"{col} >= {val}")
            want.append(Range(col, val, None))
    assert _parse_conjuncts(" AND ".join(parts)) == want
