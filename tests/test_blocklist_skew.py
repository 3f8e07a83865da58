"""Blocklist filter (datapipe/scrub.py) and skew profile (operators/skew.py):
behavior on planted fixtures and the map-only / single-agg plan shapes."""

from __future__ import annotations

import pyspark.sql.functions as F

from telemetry_parquet_spark.datapipe.scrub import blocklist_hits
from telemetry_parquet_spark.operators.skew import key_skew_profile


def test_blocklist_counts_occurrences_not_distinct(spark):
    df = spark.createDataFrame(
        [(1, "bad BAD bad good"), (2, "all clean words here"), (3, None)],
        "doc_id long, text string",
    )
    cols = blocklist_hits("text", ("bad",))
    out = {
        r.doc_id: r
        for r in df.where(F.col("text").isNotNull())
        .select("doc_id", cols["n_tokens"].alias("nt"), cols["n_blocked"].alias("nb"))
        .collect()
    }
    assert out[1].nb == 3 and out[1].nt == 4  # case-folded, every occurrence
    assert out[2].nb == 0


def test_blocklist_is_map_only(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    cols = blocklist_hits("text", ("x", "y"))
    plan = (
        df.select(cols["n_blocked"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_skew_profile_flags_hot_key(spark):
    hot = spark.range(0, 900).select(F.lit(1).alias("k"))
    rest = spark.range(0, 100).select((F.col("id") + 2).alias("k"))
    df = hot.unionByName(rest)
    r = key_skew_profile(df, "k", "t.k").collect()[0]
    assert r.n_rows == 1000 and r.n_keys == 101 and r.max_cnt == 900
    # max/mean = 900 / (1000/101)
    assert abs(r.skew_ratio - 900 * 101 / 1000) < 1e-6
    assert r.skew_ratio > 50  # unambiguous hot-key signal


def test_skew_profile_uniform_is_near_one(spark):
    df = spark.range(0, 1000).select((F.col("id") % 100).alias("k"))
    r = key_skew_profile(df, "k", "u.k").collect()[0]
    assert r.skew_ratio == 1.0
