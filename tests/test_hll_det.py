"""Deterministic-HLL library tests (datapipe/hll_det.py): estimator error
bounds on BOTH correction branches at non-default precisions, the
merge-associativity property that justifies persisted daily sketches, and
duplicate-absorption — the same error-bound pytest pattern the theta/CMS
sketch families carry.

The oracle-parity suite already hash-gates the default-p register CONTENT
and estimates cross-engine; these tests cover what the oracle can't: the
p-parameter surface and the statistical guarantee (relative error ~
1.04/sqrt(m) for the raw branch, tighter for linear counting).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.hll_det import (
    hll_det_estimates,
    hll_det_merge,
    hll_det_registers,
)


def _ids(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("grp"), F.col("id").cast("string").alias("k")
    )


@pytest.mark.parametrize("p", [8, 10, 12])
def test_raw_branch_error_bound(spark, p):
    """Cardinality >> 2.5*m forces the raw harmonic-mean branch; relative
    error must sit within 5 standard errors (sigma = 1.04/sqrt(m)) — a
    deterministic dataset, so this is a fixed-fact check, not flaky."""
    m = 1 << p
    n = 40 * m  # far above the 2.5*m linear-counting threshold
    reg = hll_det_registers(_ids(spark, n), "grp", "k", p=p)
    row = hll_det_estimates(reg, "grp", p=p).collect()[0]
    rel_err = abs(row.est_distinct - n) / n
    assert rel_err < 5 * 1.04 / math.sqrt(m), (p, row.est_distinct, n)


@pytest.mark.parametrize("p", [8, 10])
def test_linear_counting_branch_accuracy(spark, p):
    """Small cardinality (n << m) lands on the linear-counting branch,
    which is near-exact when few registers collide."""
    m = 1 << p
    n = m // 8
    reg = hll_det_registers(_ids(spark, n), "grp", "k", p=p)
    row = hll_det_estimates(reg, "grp", p=p).collect()[0]
    assert row.n_buckets_set <= n
    assert abs(row.est_distinct - n) / n < 0.1, (p, row.est_distinct, n)


def test_merge_equals_direct_build(spark):
    """Registers built per-slice then max-merged must equal the registers
    built directly on the union — the property that lets a daily pipeline
    persist m-row sketches and never re-touch history."""
    a = _ids(spark, 3000).withColumn("slice", F.col("k").cast("long") % 3)
    direct = hll_det_registers(a, "grp", "k")
    sliced = hll_det_registers(
        a.withColumn("grp2", F.concat_ws("|", "grp", "slice")), "grp2", "k"
    )
    merged = hll_det_merge(
        sliced.withColumn("grp", F.split("grp2", "\\|").getItem(0)), "grp"
    )
    assert (
        merged.select("grp", "bucket", "m_rho")
        .exceptAll(direct.select("grp", "bucket", "m_rho"))
        .union(
            direct.select("grp", "bucket", "m_rho").exceptAll(
                merged.select("grp", "bucket", "m_rho")
            )
        )
        .count()
        == 0
    )


def test_duplicates_absorbed(spark):
    """Max-aggregation absorbs duplicate keys: a corpus with every key
    repeated 5x yields byte-identical registers and estimate."""
    base = _ids(spark, 500)
    dup = base.union(base).union(base).union(base).union(base)
    r1 = hll_det_registers(base, "grp", "k")
    r2 = hll_det_registers(dup, "grp", "k")
    assert r1.exceptAll(r2).union(r2.exceptAll(r1)).count() == 0
    e1 = hll_det_estimates(r1, "grp").collect()[0]
    e2 = hll_det_estimates(r2, "grp").collect()[0]
    assert e1 == e2


def test_register_count_bounded_by_m(spark):
    """The persisted sketch state never exceeds 2^p rows per group —
    the shuffle-size contract the module docstring promises."""
    p = 8
    reg = hll_det_registers(_ids(spark, 100_000), "grp", "k", p=p)
    assert reg.count() <= (1 << p)
