"""Quantile sketch (datapipe/qsketch.py): binning exactness, the structural
error bound, and the merge law the 100 TB story depends on."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe import qsketch


def _bins(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x long")
    return df.select("x", qsketch.spark_bin_expr("x").alias("b")).collect()


def test_small_values_get_singleton_bins(spark):
    for r in _bins(spark, list(range(0, 8))):
        assert r.b.bin_lo == r.x == r.b.bin_hi


def test_bin_contains_value_and_bounds_nest(spark):
    vals = [8, 9, 15, 16, 31, 48, 100, 553, 1 << 40, (1 << 40) + 12345]
    for r in _bins(spark, vals):
        assert r.b.bin_lo <= r.x <= r.b.bin_hi
        # width ≤ lo/SUBBINS → ≤ 25% relative
        width = r.b.bin_hi - r.b.bin_lo + 1
        assert width * qsketch.SUBBINS <= r.x or r.x < 2 * qsketch.SUBBINS


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1 << 50), min_size=1, max_size=60))
def test_bin_edges_are_a_partition(sp_values):
    # pure-python replay of the arithmetic: adjacent bins must tile the line
    def bounds(x):
        if x < 2 * qsketch.SUBBINS:
            return (x, x)
        lo = 1 << (x.bit_length() - 1)
        w = lo // qsketch.SUBBINS
        sub = (x - lo) // w
        return (lo + sub * w, lo + (sub + 1) * w - 1)

    for x in sp_values:
        lo, hi = bounds(x)
        assert lo <= x <= hi
        if hi + 1 <= 1 << 50:
            nlo, _ = bounds(hi + 1)
            assert nlo == hi + 1  # no gap, no overlap


def test_merge_equals_sketch_of_union(spark):
    a = spark.range(0, 500).select((F.col("id") * 7 % 900).alias("x"), F.lit("a").alias("s"))
    b = spark.range(0, 700).select((F.col("id") * 13 % 1200).alias("x"), F.lit("b").alias("s"))
    union = a.unionByName(b)
    direct = {
        (r.bin_lo, r.bin_hi): r.cnt
        for r in qsketch.histogram(union, "x").collect()
    }
    partial = qsketch.histogram(union, "x", "s")
    merged = {
        (r.bin_lo, r.bin_hi): r.cnt
        for r in partial.groupBy("bin_lo", "bin_hi").agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert direct == merged  # bit-exact: integer counts commute


def test_quantile_error_bound(spark, sf_dir):
    from telemetry_parquet_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    hist = qsketch.histogram(docs, "n_chars", "lang")
    got = qsketch.quantiles_from_hist(hist, ["lang"], (50, 90)).collect()
    exact = {
        (r.lang, q): v
        for q in (50, 90)
        for r, v in (
            (row, row[f"p{q}"])
            for row in docs.groupBy("lang")
            .agg(
                F.expr("percentile(n_chars, 0.50)").alias("p50"),
                F.expr("percentile(n_chars, 0.90)").alias("p90"),
            )
            .collect()
        )
    }
    assert got
    for r in got:
        ex = exact[(r.lang, r.q)]
        assert r.q_bound >= ex * 0.99  # read-out is an upper bound
        assert r.q_bound <= ex * (1 + 1 / qsketch.SUBBINS) + 1


def test_histogram_plan_is_one_aggregate(spark, sf_dir):
    from telemetry_parquet_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        qsketch.histogram(docs, "n_chars", "lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # partial agg map-side, one shuffle
    assert "BatchEvalPython" not in plan
