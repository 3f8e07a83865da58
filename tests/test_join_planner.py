"""Stats-driven join planning (sources/join_planner.py): post-prune byte
estimates from manifest sizes, broadcast decision + physical-plan proof,
join-type build-side legality, and the require_broadcast raise."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.join_planner import (
    JoinPlan,
    plan_join,
    planned_bytes,
)
from telemetry_parquet_spark.sources.scan_planner import Range


@pytest.fixture()
def pair(spark, tmp_path):
    """A range-laid-out dim (16 files on k) + a fact table, as snapshots."""
    dim_root = str(tmp_path / "dim")
    fact_root = str(tmp_path / "fact")
    dim = spark.range(0, 1600).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    S.append(spark, dim_root, dim.repartitionByRange(16, "k"))
    fact = spark.range(0, 20000).select(
        (F.col("id") % 1600).alias("fk"), F.col("id").alias("val")
    )
    S.append(spark, fact_root, fact.repartition(4))
    return dim_root, fact_root


def test_manifest_records_sizes_and_planned_bytes_matches_disk(spark, pair):
    dim_root, _ = pair
    m = S.read_manifest(dim_root, S.latest_version(dim_root))
    assert set(m["sizes"]) == set(m["files"])
    for f, n in m["sizes"].items():
        assert n == os.path.getsize(os.path.join(dim_root, f))
    df, plan = S.plan_snapshot_scan(spark, dim_root, [Range("k", 0, 99)])
    est = planned_bytes(dim_root, plan)
    assert est == sum(os.path.getsize(f) for f in plan.files)
    assert est < sum(m["sizes"].values())  # pruning shrank the estimate


def test_pruning_enables_broadcast_and_plan_shows_it(spark, pair):
    dim_root, fact_root = pair
    full = sum(S.read_manifest(dim_root, 1)["sizes"].values())
    # threshold below the FULL dim size: only the pruned scan fits
    joined, plan = plan_join(
        spark, dim_root, fact_root, on=[("k", "fk")],
        left_predicates=[Range("k", 0, 99)],
        broadcast_threshold=full // 2,
        require_broadcast=True, require_pruning="left",
    )
    assert plan.broadcast == "left"
    assert plan.left_bytes <= full // 2 < full
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().executedPlan().toString()
    got = joined.groupBy("grp").agg(F.count("*").alias("n")).collect()
    dim = S.read_snapshot(spark, dim_root).where("k <= 99")
    fact = S.read_snapshot(spark, fact_root)
    want = (
        dim.join(fact, dim["k"] == fact["fk"])
        .groupBy("grp")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_no_side_fits_falls_back_to_shuffle_join(spark, pair):
    dim_root, fact_root = pair
    # isolate the PLANNER's decision from Catalyst's own size estimate
    # (which happily broadcasts these tiny test tables on its own)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined, plan = plan_join(
            spark, dim_root, fact_root, on=[("k", "fk")],
            broadcast_threshold=1,
        )
        assert plan.broadcast is None
        s = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    with pytest.raises(RuntimeError, match="no side fits"):
        plan_join(
            spark, dim_root, fact_root, on=[("k", "fk")],
            broadcast_threshold=1, require_broadcast=True,
        )


def test_outer_join_build_side_legality(spark, pair):
    dim_root, fact_root = pair
    # LEFT join: the preserved (left) side must never broadcast, even
    # when it is the smaller side
    joined, plan = plan_join(
        spark, dim_root, fact_root, on=[("k", "fk")], how="left",
        left_predicates=[Range("k", 0, 99)],
        broadcast_threshold=10 << 30,
    )
    assert plan.broadcast == "right"
    # full outer: nothing broadcastable
    _, plan = plan_join(
        spark, dim_root, fact_root, on=[("k", "fk")], how="full",
        broadcast_threshold=10 << 30,
    )
    assert plan.broadcast is None
    # left outer row semantics survive the decision
    rows = joined.where(F.col("fk").isNull()).count()
    assert rows == 0  # every dim k in [0,99] has fact matches


def test_smaller_side_wins_when_both_fit(spark, pair):
    dim_root, fact_root = pair
    joined, plan = plan_join(
        spark, dim_root, fact_root, on=[("k", "fk")],
        broadcast_threshold=10 << 30,
    )
    assert plan.broadcast == ("left" if plan.left_bytes <= plan.right_bytes else "right")
    assert isinstance(plan, JoinPlan)
