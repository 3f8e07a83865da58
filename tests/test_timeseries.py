"""Day-spine gap filling: interpolation math, pass-through, edge bounds."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from telemetry_parquet_spark.operators.timeseries import gap_fill_interpolate


def _daily(spark, rows):
    return spark.createDataFrame(rows, ["k", "d", "v"]).select(
        "k", F.col("d").cast("date").alias("d"), F.col("v").cast("double").alias("v")
    )


def test_linear_interpolation_across_gap(spark):
    df = _daily(
        spark,
        [("a", "2024-01-01", 10.0), ("a", "2024-01-04", 40.0)],
    )
    got = {
        str(r.d): (r.v, r.interpolated)
        for r in gap_fill_interpolate(df, "k", "d", "v").collect()
    }
    assert got == {
        "2024-01-01": (10.0, False),
        "2024-01-02": (20.0, True),
        "2024-01-03": (30.0, True),
        "2024-01-04": (40.0, False),
    }


def test_observed_days_pass_through_and_no_outside_spine(spark):
    df = _daily(
        spark,
        [
            ("a", "2024-01-05", 1.5),
            ("a", "2024-01-06", 2.5),
            ("b", "2024-02-01", 7.0),
        ],
    )
    rows = gap_fill_interpolate(df, "k", "d", "v").collect()
    # spine bounded by each key's own observed range — no invented edges
    assert len(rows) == 3
    assert all(not r.interpolated for r in rows)
    assert {(r.k, str(r.d), r.v) for r in rows} == {
        ("a", "2024-01-05", 1.5),
        ("a", "2024-01-06", 2.5),
        ("b", "2024-02-01", 7.0),
    }


def test_multiple_gaps_and_keys(spark):
    df = _daily(
        spark,
        [
            ("a", "2024-01-01", 0.0),
            ("a", "2024-01-03", 4.0),
            ("a", "2024-01-05", 0.0),
            ("b", "2024-01-01", 100.0),
            ("b", "2024-01-02", 200.0),
        ],
    )
    out = gap_fill_interpolate(df, "k", "d", "v")
    a = {
        str(r.d): r.v for r in out.where(F.col("k") == "a").collect()
    }
    assert a == {
        "2024-01-01": 0.0,
        "2024-01-02": 2.0,
        "2024-01-03": 4.0,
        "2024-01-04": 2.0,
        "2024-01-05": 0.0,
    }
    assert out.where(F.col("k") == "b").count() == 2


def test_single_shuffle_shared_by_join_and_windows(spark):
    """The 100 TB claim in the module docstring: spine agg, join, and both
    window scans share ONE key-partitioned Exchange lineage — assert the
    physical plan contains no more than 2 shuffle exchanges (the daily
    input's own partitioning plus the key partitioning)."""
    df = _daily(spark, [("a", "2024-01-01", 1.0), ("a", "2024-01-03", 3.0)])
    plan = (
        gap_fill_interpolate(df, "k", "d", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan
