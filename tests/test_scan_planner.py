"""Unified scan planner tests (sources/scan_planner.py): exactness vs the
full-scan filter, per-mechanism pruning accounting, the require gate, and
the conservative keep on missing stats."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources.scan_planner import (
    Eq,
    Range,
    ScanPlan,
    build_minmax_file_stats,
    plan_scan,
)
from telemetry_parquet_spark.sources.skipping import (
    build_file_bloom_index,
    ensure_split_dataset,
)


@pytest.fixture(scope="module")
def split_orders(spark, sf_dir):
    src = os.path.join(sf_dir, "orders.parquet")
    return ensure_split_dataset(
        spark, src, "skip_orders_" + os.path.basename(sf_dir.rstrip("/")),
        layout_col="o_orderdate",
    )


@pytest.fixture(scope="module")
def ts_bounds(spark, split_orders):
    return (
        spark.read.parquet(split_orders)
        .select(
            F.lit("1996-01-01").cast("timestamp").alias("lo"),
            F.lit("1997-06-30").cast("timestamp").alias("hi"),
        )
        .first()
    )


def test_composed_pruning_exact_and_engaged(spark, split_orders, ts_bounds):
    files = spark.read.parquet(split_orders)
    probe = (
        files.where(F.col("o_orderdate").between(ts_bounds.lo, ts_bounds.hi))
        .agg(F.min("o_custkey"))
        .first()[0]
    )
    preds = [Range("o_orderdate", ts_bounds.lo, ts_bounds.hi), Eq("o_custkey", probe)]
    pruned, plan = plan_scan(
        spark,
        split_orders,
        preds,
        stats=build_minmax_file_stats(files, ["o_orderdate"]),
        bloom_indexes={"o_custkey": build_file_bloom_index(files, "o_custkey")},
        require_each_pruning=True,
    )
    expected = files.where(
        F.col("o_orderdate").between(ts_bounds.lo, ts_bounds.hi)
        & (F.col("o_custkey") == probe)
    )
    assert pruned.exceptAll(expected).union(expected.exceptAll(pruned)).count() == 0
    assert pruned.count() > 0
    # both mechanisms removed files, and the accounting is monotone
    assert plan.pruned_by("minmax:o_orderdate") > 0
    assert plan.pruned_by("bloom:o_custkey") > 0
    kept = [n for _, n in plan.steps]
    assert kept == sorted(kept, reverse=True)
    assert len(plan.files) == kept[-1] <= plan.total_files


def test_minmax_only_range(spark, split_orders, ts_bounds):
    files = spark.read.parquet(split_orders)
    pruned, plan = plan_scan(
        spark,
        split_orders,
        [Range("o_orderdate", ts_bounds.lo, ts_bounds.hi)],
        stats=build_minmax_file_stats(files, ["o_orderdate"]),
        require_each_pruning=True,
    )
    expected = files.where(
        F.col("o_orderdate").between(ts_bounds.lo, ts_bounds.hi)
    )
    assert pruned.count() == expected.count()
    assert plan.steps[0][0] == "minmax:o_orderdate"


def test_absent_key_returns_empty(spark, split_orders):
    files = spark.read.parquet(split_orders)
    index = build_file_bloom_index(files, "o_custkey")
    pruned, plan = plan_scan(
        spark,
        split_orders,
        [Eq("o_custkey", -12345)],
        bloom_indexes={"o_custkey": index},
    )
    assert pruned.count() == 0
    assert len(plan.files) < plan.total_files  # bloom dropped everything-ish
    assert pruned.schema == files.drop("_metadata").schema


def test_require_raises_when_mechanism_prunes_nothing(spark, split_orders):
    files = spark.read.parquet(split_orders)
    # a range covering the whole domain cannot prune any file
    with pytest.raises(RuntimeError, match="pruned nothing"):
        plan_scan(
            spark,
            split_orders,
            [Range("o_orderdate", None, None)],
            stats=build_minmax_file_stats(files, ["o_orderdate"]),
            require_each_pruning=True,
        )


def test_missing_stats_column_keeps_files(spark, split_orders, ts_bounds):
    """Stats that don't cover a predicate's column must not prune on it —
    the planner only routes predicates through mechanisms that know the
    column; everything else is residual-filter-only."""
    files = spark.read.parquet(split_orders)
    pruned, plan = plan_scan(
        spark,
        split_orders,
        [Range("o_totalprice", 0.0, 1.0)],
        stats=build_minmax_file_stats(files, ["o_orderdate"]),
    )
    assert plan.steps == []  # no mechanism engaged
    assert len(plan.files) == plan.total_files
    expected = files.where(F.col("o_totalprice").between(0.0, 1.0))
    assert pruned.count() == expected.count()


def test_pruned_by_unknown_mechanism_raises():
    plan = ScanPlan(total_files=4, steps=[("minmax", 2)])
    with pytest.raises(KeyError):
        plan.pruned_by("bloom:x")


def test_in_list_pruning_exact_and_single_probe_union(spark, split_orders):
    """An IN-list predicate prunes through the batched one-job Bloom probe
    (union of per-value candidate sets) and through min/max, and the
    result equals the full-scan isin filter exactly."""
    from telemetry_parquet_spark.sources.scan_planner import In
    from telemetry_parquet_spark.sources.skipping import (
        bloom_candidate_files,
        bloom_candidate_files_any,
        build_file_bloom_index,
    )

    files = spark.read.parquet(split_orders)
    keys = [
        r[0]
        for r in files.select("o_custkey").distinct().orderBy("o_custkey")
        .limit(3).collect()
    ]
    index = build_file_bloom_index(files, "o_custkey")

    # batched probe == union of per-value probes
    union = set()
    for v in keys:
        union |= set(bloom_candidate_files(index, v))
    batched = set(bloom_candidate_files_any(index, keys))
    assert batched == union

    pruned, plan = plan_scan(
        spark,
        split_orders,
        [In("o_custkey", tuple(keys))],
        stats=build_minmax_file_stats(files, ["o_custkey"]),
        bloom_indexes={"o_custkey": index},
    )
    expected = files.where(F.col("o_custkey").isin(keys))
    assert pruned.exceptAll(expected).union(expected.exceptAll(pruned)).count() == 0
    assert pruned.count() > 0
    assert plan.pruned_by("bloom:o_custkey") >= 0
    assert len(plan.files) <= plan.total_files


def test_table_service_lifecycle_end_to_end(spark, sf_dir, tmp_path):
    """The whole table-service story on one table: a streaming relay
    lands files, the Bloom index keeps up INCREMENTALLY, point lookups go
    through the planner against the live index, then compaction rewrites
    the landing zone and a fresh index over the compacted layout serves
    the same lookup — identical answers at every step."""
    from telemetry_parquet_spark.sources.compaction import (
        maintenance_pass,
        read_compacted,
    )
    from telemetry_parquet_spark.sources.skipping import (
        update_file_bloom_index,
    )
    from telemetry_parquet_spark.streaming.pipelines import (
        stream_append_parquet,
    )

    src = str(tmp_path / "src")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    probe = orders.agg(F.min("o_custkey")).first()[0]
    expected = orders.where(F.col("o_custkey") == probe).drop("_metadata")

    index = None
    for batch in (
        orders.where(F.col("o_orderkey") % 2 == 0),
        orders.where(F.col("o_orderkey") % 2 != 0),
    ):
        batch.repartition(4).write.mode("append").parquet(src)
        stream_append_parquet(spark, src, landing, ckpt)
        index = update_file_bloom_index(
            spark, landing, index, "o_custkey"
        ).localCheckpoint()

    pruned, plan = plan_scan(
        spark, landing, [Eq("o_custkey", probe)],
        bloom_indexes={"o_custkey": index},
    )
    assert pruned.exceptAll(expected).union(expected.exceptAll(pruned)).count() == 0
    assert len(plan.files) < plan.total_files

    compacted = str(tmp_path / "compacted")
    stats = maintenance_pass(spark, landing, compacted, target_bytes=1 << 30)
    assert stats["compacted"]
    got = read_compacted(spark, compacted).where(F.col("o_custkey") == probe)
    assert got.exceptAll(expected).union(expected.exceptAll(got)).count() == 0
