"""Entity resolution: blocking semantics, fuzzy verify, match groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.entity import (
    er_blocked_fuzzy_pairs,
    er_match_groups,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["id", "name"])


def test_fuzzy_pairs_within_block(spark):
    df = _df(
        spark,
        [
            (1, "acme corp"),
            (2, "acme c0rp"),  # dist 1, same block
            (3, "acme corporation"),  # dist 7 from #1 — verify rejects
            (4, "zeta llc"),  # different block
            (5, "zeta lld"),  # dist 1 from #4, same block
        ],
    )
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in er_blocked_fuzzy_pairs(
            df, "id", "name", block=F.substring("name", 1, 6), max_dist=1
        ).collect()
    )
    assert got == [(1, 2, 1), (4, 5, 1)]


def test_blocking_recall_trade_is_real(spark):
    """A dist-1 pair whose difference falls INSIDE the blocking key is never
    compared — the documented ER blocking trade (same reason LSH bands miss
    low-similarity pairs). This test pins the semantics so a block-key
    change shows up as a diff, not a silent recall shift."""
    df = _df(spark, [(1, "abcdef"), (2, "aXcdef")])  # differ at position 2
    got = er_blocked_fuzzy_pairs(
        df, "id", "name", block=F.substring("name", 1, 3), max_dist=2
    ).collect()
    assert got == []  # blocked apart, never verified


def test_exact_duplicates_excluded(spark):
    df = _df(spark, [(1, "same name"), (2, "same name")])
    got = er_blocked_fuzzy_pairs(
        df, "id", "name", block=F.substring("name", 1, 4), max_dist=2
    ).collect()
    assert got == []  # dist 0 belongs to exact dedup, not fuzzy ER


def test_match_groups_transitive_and_singletons(spark):
    df = _df(
        spark,
        [
            (10, "node a1"),
            (11, "node a2"),  # 10–11 dist 1
            (12, "node a3"),  # 11–12 dist 1 → chains to 10 transitively
            (20, "other x"),  # singleton
        ],
    )
    pairs = er_blocked_fuzzy_pairs(
        df, "id", "name", block=F.substring("name", 1, 5), max_dist=1
    )
    groups = {
        r.member_id: r.entity_id
        for r in er_match_groups(pairs, df, "id").collect()
    }
    assert groups == {10: 10, 11: 10, 12: 10, 20: 20}


def test_max_dist_validation(spark):
    df = _df(spark, [(1, "x")])
    with pytest.raises(ValueError):
        er_blocked_fuzzy_pairs(df, "id", "name", block=F.col("name"), max_dist=0)
