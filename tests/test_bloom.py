"""Bloom-filter incremental dedup: exactness vs the plain anti-join, no
false negatives, bitmap mergeability, and the plan shape that makes it the
100 TB answer (history never shuffled, every join broadcast)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.bloom import (
    bloom_might_contain,
    build_bloom,
    incremental_dedup_bloom,
)
from telemetry_parquet_spark.plans.explain import formatted_plan


def _frames(spark):
    history = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 600)], ["key"]
    )
    # 200 duplicate keys + 400 fresh keys
    new = spark.createDataFrame(
        [(i, f"k{i}") for i in range(400, 1000)], ["row_id", "key"]
    )
    return history, new


def test_survivors_equal_plain_anti_join(spark):
    history, new = _frames(spark)
    got = {
        r.row_id
        for r in incremental_dedup_bloom(
            new, history, key_col="key", num_bits=1 << 14, num_hashes=5
        ).collect()
    }
    expected = {
        r.row_id
        for r in new.join(history, "key", "left_anti").collect()
    }
    assert got == expected
    assert got == set(range(600, 1000))


def test_no_false_negatives_even_when_saturated(spark):
    """An undersized (saturated) bitmap degrades to might_contain=True for
    everything — never to a false negative — so the output stays exact."""
    history, new = _frames(spark)
    tiny = incremental_dedup_bloom(
        new, history, key_col="key", num_bits=64, num_hashes=5
    )
    expected = {r.row_id for r in new.join(history, "key", "left_anti").collect()}
    assert {r.row_id for r in tiny.collect()} == expected

    # and every true member must probe positive
    bloom = build_bloom(history, "key", num_bits=1 << 14, num_hashes=5)
    flags = bloom_might_contain(
        history, bloom, "key", num_bits=1 << 14, num_hashes=5
    )
    assert flags.where(~F.col("might_contain")).count() == 0


def test_bitmap_bounded_and_mergeable(spark):
    """The bitmap never exceeds num_bits/64 rows, and the filter for A∪B is
    exactly bit_or of the two filters — the property that lets a nightly
    pipeline fold new keys in instead of rebuilding over all history."""
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], ["key"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], ["key"])
    num_bits = 1 << 12
    ba = build_bloom(a, "key", num_bits=num_bits, num_hashes=5)
    bb = build_bloom(b, "key", num_bits=num_bits, num_hashes=5)
    assert ba.count() <= num_bits // 64
    merged = (
        ba.unionByName(bb)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = build_bloom(a.unionByName(b), "key", num_bits=num_bits, num_hashes=5)
    diff = merged.alias("m").join(direct.alias("d"), "word_idx", "full").where(
        F.col("m.bits").eqNullSafe(F.col("d.bits")) == False  # noqa: E712
    )
    assert diff.count() == 0


def test_plan_history_never_shuffled_on_key(spark):
    """The whole point at 100 TB: the plain anti-join shuffles (sorts) the
    full history on the dedup key every run; the Bloom form must not. Assert
    no SortMergeJoin / ShuffledHashJoin anywhere, all key joins broadcast,
    and no exchange hash-partitions history's key column — the only
    aggregation exchanges allowed are the bounded bitmap build (word_idx)
    and the new-side bool_and/distinct (keys of the NEW day only)."""
    history, new = _frames(spark)
    out = incremental_dedup_bloom(
        new, history, key_col="key", num_bits=1 << 14, num_hashes=5
    )
    plan = formatted_plan(out)
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # every hashpartitioning exchange must be the bitmap (word_idx) or a
    # new-side key agg; none may carry history rows: with broadcast-only
    # joins, history feeds no exchange except via build_bloom's word_idx
    exchanges = re.findall(r"hashpartitioning\(([^,)]+)", plan)
    assert exchanges, plan
    for col in exchanges:
        assert col.strip().startswith(("word_idx", "key")), (col, plan)
