"""KMV/theta sketches: mergeability, estimate sanity, set-algebra
correctness on handcrafted audiences."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.theta import (
    HASH_SPACE,
    kmv_distinct_estimates,
    kmv_pair_set_estimates,
    kmv_sketch,
    kmv_thetas,
)


def _audiences(spark, spec):
    rows = [(g, m) for g, members in spec.items() for m in members]
    return spark.createDataFrame(rows, ["grp", "member"])


def test_sketch_is_exact_below_k(spark):
    """With fewer than k distinct keys the sample IS the key set and the
    estimate is exact."""
    df = _audiences(spark, {"a": [f"u{i}" for i in range(10)]})
    sk = kmv_sketch(df, "grp", "member", k=32)
    assert sk.count() == 10
    est = kmv_distinct_estimates(sk, "grp", k=32).first()
    assert est.est_distinct == 10.0


def test_merge_by_reranking_equals_sketch_of_union(spark):
    """The persistence story: day-1 and day-2 sketches merged by re-ranking
    the unioned samples must equal the sketch of the unioned raw data —
    KMV's mergeability property, byte-exact."""
    day1 = _audiences(spark, {"a": [f"u{i}" for i in range(60)]})
    day2 = _audiences(spark, {"a": [f"u{i}" for i in range(40, 100)]})
    k = 16
    s1 = kmv_sketch(day1, "grp", "member", k=k)
    s2 = kmv_sketch(day2, "grp", "member", k=k)
    from pyspark.sql import Window

    merged = (
        s1.select("grp", "h")
        .union(s2.select("grp", "h"))
        .distinct()
        .withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("grp").orderBy("h")),
        )
        .where(F.col("rank") <= k)
        .select("grp", "rank", "h")
    )
    direct = kmv_sketch(day1.union(day2), "grp", "member", k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_estimate_error_bound_at_scale(spark):
    """Full-sketch estimate must land within the KMV standard-error
    envelope (~1/sqrt(k-2)): for k=64 and 2000 true distinct, 3 sigma is
    ~38% — we assert a generous 50% band, deterministic seed."""
    n, k = 2000, 64
    df = _audiences(spark, {"a": [f"user{i}" for i in range(n)]})
    sk = kmv_sketch(df, "grp", "member", k=k)
    est = kmv_distinct_estimates(sk, "grp", k=k).first().est_distinct
    assert abs(est - n) / n < 0.5, est


def test_pair_estimates_on_disjoint_and_identical(spark):
    """Degenerate set algebra: identical audiences intersect fully
    (est_intersection == est per-set, n_retained == sample size below θ);
    disjoint small audiences intersect at exactly zero (exact regime)."""
    small_a = [f"a{i}" for i in range(8)]
    small_b = [f"b{i}" for i in range(12)]
    df = _audiences(spark, {"x": small_a, "y": small_b, "z": small_b})
    sk = kmv_sketch(df, "grp", "member", k=32)
    out = {
        (r.group_a, r.group_b): r
        for r in kmv_pair_set_estimates(sk, "grp", k=32).collect()
    }
    assert out[("x", "y")].n_retained == 0
    assert out[("x", "y")].est_intersection == 0.0
    assert out[("x", "y")].est_union == 20.0  # exact regime: 8 + 12
    assert out[("y", "z")].n_retained == 12
    assert out[("y", "z")].est_intersection == 12.0
    assert out[("y", "z")].est_union == 12.0


def test_theta_is_kth_value_when_full(spark):
    df = _audiences(spark, {"a": [f"u{i}" for i in range(50)]})
    k = 8
    sk = kmv_sketch(df, "grp", "member", k=k)
    kth = sk.where(F.col("rank") == k).first().h
    t = kmv_thetas(sk, "grp", k=k).first()
    assert t.theta == kth and t.theta < HASH_SPACE


def test_k_validation(spark):
    df = _audiences(spark, {"a": ["u"]})
    with pytest.raises(ValueError):
        kmv_sketch(df, "grp", "member", k=1)
