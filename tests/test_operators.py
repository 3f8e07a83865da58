"""Operator-library unit tests with hand-built fixtures — the reference's
UDAF test semantics (AggMapSum/AggMapFirst/AggRowFirst/AggSearchCounts/
CollectList) re-checked against our expression rewrites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.operators.aggregates import (
    agg_map_first,
    agg_map_sum,
    agg_row_first,
    agg_search_counts,
    hll_estimate,
    hll_merge,
    hll_sketch,
)
from telemetry_parquet_spark.operators.dedup import (
    earliest_per_key,
    incremental_dedup,
)
from telemetry_parquet_spark.operators.temporal_joins import as_of_join
from telemetry_parquet_spark.operators.topk import collect_top_k_per_group


def test_agg_map_sum(spark):
    """AggMapSum.scala semantics: pointwise sums, null values skipped."""
    df = spark.createDataFrame(
        [
            ("g1", {"a": 1, "b": 2}),
            ("g1", {"a": 10, "c": 5}),
            ("g1", {"b": None}),
            ("g2", {"z": 7}),
        ],
        "k string, m map<string,int>",
    )
    out = {r.k: r.m for r in agg_map_sum(df, ["k"], "m").collect()}
    assert out["g1"] == {"a": 11, "b": 2, "c": 5}
    assert out["g2"] == {"z": 7}


def test_agg_map_first(spark):
    """AggMapFirst.scala: first non-null value per key — 'first' defined by
    our explicit order column (deterministic divergence, SURVEY §7 #1)."""
    df = spark.createDataFrame(
        [
            ("g1", 2, {"a": "later", "c": "only"}),
            ("g1", 1, {"a": "first", "b": None}),
        ],
        "k string, seq int, m map<string,string>",
    )
    out = {r.k: r.m for r in agg_map_first(df, ["k"], "m", ["seq"]).collect()}
    assert out["g1"] == {"a": "first", "c": "only"}  # null b dropped


def test_agg_row_first(spark):
    """AggRowFirst.scala: one struct per distinct id across the group."""
    df = spark.createDataFrame(
        [
            ("g1", 1, [{"id": 1, "v": "one-a"}, {"id": 2, "v": "two"}]),
            ("g1", 2, [{"id": 1, "v": "one-b"}, {"id": 3, "v": "three"}]),
        ],
        "k string, seq int, items array<struct<id:int,v:string>>",
    )
    out = agg_row_first(df, ["k"], "items", id_field="id", order_cols=["seq"])
    items = out.where(F.col("k") == "g1").first().items
    assert [(i.id, i.v) for i in items] == [(1, "one-a"), (2, "two"), (3, "three")]


def test_agg_search_counts(spark):
    """AggSearchCounts.scala: allowlist pivot-sum + _all total; groups with
    no allowlisted source keep zero rows; count<=0 ignored."""
    df = spark.createDataFrame(
        [
            ("u1", [("google", "urlbar", 2), ("ddg", "searchbar", 3)]),
            ("u1", [("google", "urlbar", -5), ("google", "abouthome", 1)]),
            ("u2", [("bing", "other", 9)]),
            ("u3", []),
        ],
        "u string, sc array<struct<engine:string,source:string,count:bigint>>",
    )
    out = {
        r.u: r
        for r in agg_search_counts(
            df, ["u"], "sc", valid_sources=["urlbar", "searchbar", "abouthome"]
        ).collect()
    }
    assert out["u1"].search_count_all == 6  # -5 ignored
    assert out["u1"].search_count_urlbar == 2
    assert out["u1"].search_count_searchbar == 3
    assert out["u1"].search_count_abouthome == 1
    assert out["u2"].search_count_all == 0  # 'other' not allowlisted
    assert out["u3"].search_count_all == 0  # empty array keeps the group


def test_collect_top_k_null_retention_and_sort(spark):
    """CollectList.scala:15-166: null-retaining multi-key sort (desc, nulls
    last) + trim — the exact reason the reference wrote a custom UDAF."""
    df = spark.createDataFrame(
        [
            ("g", 3, "c"),
            ("g", 1, "a"),
            ("g", None, "null-ts"),
            ("g", 5, None),  # null payload must be retained
            ("g", 4, "d"),
        ],
        "k string, ts int, payload string",
    )
    out = collect_top_k_per_group(
        df,
        keys=["k"],
        order_cols=[("ts", True)],
        payload_cols=["payload"],
        k=4,
        out_col="collected",
    )
    items = out.first().collected
    assert [(i.ts, i.payload) for i in items] == [
        (5, None),  # null payload kept
        (4, "d"),
        (3, "c"),
        (1, "a"),  # trimmed to 4; null-ts sorted last then cut
    ]


def test_hll_sketch_merge_estimate(spark):
    df = spark.createDataFrame(
        [("d1", f"u{i % 50}") for i in range(200)]
        + [("d2", f"u{i % 80}") for i in range(200)],
        "day string, user string",
    )
    daily = hll_sketch(df, ["day"], "user")
    assert daily.count() == 2
    merged = hll_merge(daily.withColumn("all", F.lit(1)), ["all"])
    est = hll_estimate(merged).first().distinct_estimate
    assert abs(est - 80) / 80 < 0.05  # users are u0..u79 overall


def test_incremental_dedup(spark):
    """PioneerOnlineNewsDedupe pipeline: prior-state anti-join + earliest-wins."""
    prior = spark.createDataFrame(
        [("p1", 100, "seen", "2024-01-01")],
        "pid string, ets long, payload string, day string",
    )
    new = spark.createDataFrame(
        [
            ("p1", 100, "dup-of-prior", "2024-01-02"),
            ("p2", 200, "late-copy", "2024-01-02"),
            ("p2", 200, "late-copy-2", "2024-01-02"),
            ("p3", 300, "fresh", "2024-01-02"),
        ],
        "pid string, ets long, payload string, day string",
    )
    out = incremental_dedup(
        new, prior, dedup_keys=["pid", "ets"], earliest_cols=["day", "payload"]
    )
    got = {(r.pid, r.ets): r.payload for r in out.collect()}
    assert got == {("p2", 200): "late-copy", ("p3", 300): "fresh"}


def test_earliest_per_key_ties(spark):
    df = spark.createDataFrame(
        [("k", 1, "b"), ("k", 1, "a"), ("k", 2, "c")], "k string, ts int, v string"
    )
    out = earliest_per_key(df, ["k"], ["ts", "v"])
    assert out.first().v == "a"  # tie on ts broken by v


def test_as_of_join_tolerance_and_edges(spark):
    left = spark.createDataFrame(
        [("u", 100, "l1"), ("u", 200, "l2"), ("v", 50, "l3")],
        "k string, t long, tag string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "tag")
    right = spark.createDataFrame(
        [("u", 100, "r-exact"), ("u", 150, "r-mid")],
        "k string, t long, rtag string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "rtag")

    out = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     right_payload=["rtag"])
    got = {r.tag: r.rtag_right for r in out.collect()}
    assert got == {"l1": "r-exact", "l2": "r-mid", "l3": None}

    # tolerance: l2 at t=200 only matches within 10s -> nothing
    tight = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts",
                       right_payload=["rtag"], tolerance_seconds=10)
    got = {r.tag: r.rtag_right for r in tight.collect()}
    assert got == {"l1": "r-exact", "l2": None, "l3": None}


def test_range_join_left_keeps_unmatched(spark):
    """The exact range predicate lives in the join condition, so left joins
    keep points that fall inside no interval (nulls on the interval side)
    instead of collapsing to inner semantics."""
    import pytest

    from telemetry_parquet_spark.operators.temporal_joins import range_join

    pts = spark.createDataFrame(
        [("u", 100, "in"), ("u", 5000, "out"), ("w", 100, "other-key")],
        "k string, t long, tag string",
    ).select("k", F.timestamp_seconds("t").alias("pts_ts"), "tag")
    iv = spark.createDataFrame(
        [("u", 50, 200, "iv1")],
        "k string, s long, e long, iv string",
    ).select(
        "k",
        F.timestamp_seconds("s").alias("start_ts"),
        F.timestamp_seconds("e").alias("end_ts"),
        "iv",
    )

    inner = range_join(pts, iv, left_ts="pts_ts", start_col="start_ts",
                       end_col="end_ts", on="k", bucket_seconds=60)
    assert {r.tag: r.iv for r in inner.collect()} == {"in": "iv1"}

    left = range_join(pts, iv, left_ts="pts_ts", start_col="start_ts",
                      end_col="end_ts", on="k", bucket_seconds=60, how="left")
    got = {r.tag: r.iv for r in left.collect()}
    assert got == {"in": "iv1", "out": None, "other-key": None}

    with pytest.raises(ValueError, match="inner/left"):
        range_join(pts, iv, left_ts="pts_ts", start_col="start_ts",
                   end_col="end_ts", how="full")
