"""Count-min sketch: never-undercount, linear mergeability (bit-exact),
unseen-term behavior, and width-driven accuracy — against exact counts."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from telemetry_parquet_spark.datapipe.count_min import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _sketch_dict(df):
    return {(r.row_i, r.bucket): r.cnt for r in df.collect()}


def _estimates(spark, terms: list[str], query_terms: list[str],
               depth: int = 4, width: int = 64):
    df = spark.createDataFrame([(t,) for t in terms], ["term"])
    q = spark.createDataFrame([(t,) for t in set(query_terms)], ["term"])
    sk = cms_build(df, depth=depth, width=width)
    return {
        r.term: r.est
        for r in cms_estimate(sk, q, depth=depth, width=width).collect()
    }


def test_never_undercounts(spark):
    terms = ["a"] * 7 + ["b"] * 3 + ["c"] * 11 + ["dd"] * 2 + ["e"]
    true = Counter(terms)
    est = _estimates(spark, terms, list(true), depth=4, width=8)  # tight width
    for t, n in true.items():
        assert est[t] >= n, (t, est[t], n)


def test_exact_when_width_comfortable(spark):
    """With width ≫ distinct terms, collisions are unlikely per row and the
    MIN over 4 independent rows recovers exact counts for this fixture."""
    terms = ["x"] * 5 + ["y"] * 2 + ["z"]
    est = _estimates(spark, terms, ["x", "y", "z"], depth=4, width=64)
    assert est == {"x": 5, "y": 2, "z": 1}


def test_unseen_term_estimate_is_collision_noise_only(spark):
    terms = ["only"] * 4
    est = _estimates(spark, terms, ["absent"], depth=4, width=64)
    # absent term's probes either miss (0) or collide with 'only' (≤ 4)
    assert 0 <= est["absent"] <= 4


def test_linear_merge_is_bit_exact(spark):
    """cms(A ∪ B) == merge(cms(A), cms(B)) cell for cell — the linearity
    that makes the sketch persistable per-day and combinable later."""
    a = ["p"] * 4 + ["q"] * 2 + ["r"]
    b = ["q"] * 5 + ["s"] * 3
    df_a = spark.createDataFrame([(t,) for t in a], ["term"])
    df_b = spark.createDataFrame([(t,) for t in b], ["term"])
    df_ab = spark.createDataFrame([(t,) for t in a + b], ["term"])
    merged = cms_merge(cms_build(df_a), cms_build(df_b))
    direct = cms_build(df_ab)
    assert _sketch_dict(merged) == _sketch_dict(direct)


@settings(max_examples=10, deadline=None)
@given(
    counts=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=6),
        min_size=1,
        max_size=8,
    )
)
def test_never_undercounts_property(spark, counts):
    terms = [t for t, n in counts.items() for _ in range(n)]
    est = _estimates(spark, terms, list(counts), depth=3, width=4)
    for t, n in counts.items():
        assert est[t] >= n


def test_sketch_size_is_bounded(spark):
    """The sketch never exceeds depth × width rows no matter the input."""
    terms = [f"t{i}" for i in range(500)]
    df = spark.createDataFrame([(t,) for t in terms], ["term"])
    sk = cms_build(df, depth=4, width=16).collect()
    assert len(sk) <= 4 * 16
    # every row's total equals the input size (each row of the sketch is a
    # full partition of the stream)
    per_row = Counter()
    for r in sk:
        per_row[r.row_i] += r.cnt
    assert all(v == 500 for v in per_row.values())
