"""Misra-Gries heavy hitters: count bounds, presence guarantee,
mergeability, and the exact regime — all against exact Python counts."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from telemetry_parquet_spark.datapipe.heavy_hitters import (
    _mg_compress,
    mg_topk,
)


def _run(spark, terms: list[str], k: int, partitions: int = 4):
    df = spark.createDataFrame(
        [(t,) for t in terms], ["term"]
    ).repartition(partitions)
    rows = mg_topk(df, k=k).collect()
    return {r.term: (r.count_lb, r.err_ub) for r in rows}


def test_exact_regime_when_k_exceeds_distinct(spark):
    """k > distinct terms: no decrement fires anywhere, the sketch equals
    the exact counts with err_ub = 0 regardless of partitioning — the
    property that makes vocab_heavy_hitters an exact driver gate."""
    terms = ["a"] * 10 + ["b"] * 5 + ["c"] * 3 + ["d"]
    for partitions in (1, 3, 7):
        got = _run(spark, terms, k=8, partitions=partitions)
        assert got == {"a": (10, 0), "b": (5, 0), "c": (3, 0), "d": (1, 0)}


def test_bounds_hold_in_lossy_regime(spark):
    """k < distinct: every emitted term satisfies
    count_lb ≤ true ≤ count_lb + err_ub."""
    terms = (
        ["hot"] * 50
        + ["warm"] * 20
        + [f"cold{i}" for i in range(40)]  # 40 singletons force decrements
    )
    got = _run(spark, terms, k=4, partitions=3)
    true = Counter(terms)
    assert got, "sketch must emit something"
    assert len(got) <= 4
    for term, (lb, err) in got.items():
        assert lb <= true[term] <= lb + err, (term, lb, err, true[term])


def test_heavy_hitter_presence_guarantee(spark):
    """Any term with true frequency > 2N/k must appear in the top-k."""
    n_noise = 60
    terms = ["giant"] * 100 + [f"n{i}" for i in range(n_noise)]
    # N = 160, k = 8 → threshold 2N/k = 40 < 100
    got = _run(spark, terms, k=8, partitions=5)
    assert "giant" in got
    lb, err = got["giant"]
    assert lb <= 100 <= lb + err


@settings(max_examples=25, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=20),
    k=st.integers(min_value=2, max_value=8),
)
def test_mg_compress_properties(counts, k):
    """The compress step alone: ≤ k survivors, each decremented by exactly
    the reported dec, and dec ≤ total/(k+1)."""
    d = {f"t{i}": c for i, c in enumerate(counts)}
    out, dec = _mg_compress(dict(d), k)
    assert len(out) <= k
    for t, c in out.items():
        assert c == d[t] - dec and c > 0
    if len(d) <= k:
        assert dec == 0
    else:
        assert dec * (k + 1) <= sum(counts)


def test_merge_of_partition_sketches_is_valid_sketch(spark):
    """Mergeability: running the pipeline over differently-partitioned
    copies of the same data always yields valid bounds — the merged
    summary is itself an MG-style summary (sum of lower bounds, sum of
    decrements)."""
    terms = ["x"] * 30 + ["y"] * 18 + [f"z{i % 25}" for i in range(50)]
    true = Counter(terms)
    for partitions in (1, 2, 6, 11):
        got = _run(spark, terms, k=6, partitions=partitions)
        for term, (lb, err) in got.items():
            assert lb <= true[term] <= lb + err


@pytest.mark.parametrize("k", [1, 2])
def test_tiny_k(spark, k):
    terms = ["a"] * 9 + ["b"] * 3
    got = _run(spark, terms, k=k, partitions=2)
    assert len(got) <= k
    true = Counter(terms)
    for term, (lb, err) in got.items():
        assert lb <= true[term] <= lb + err
