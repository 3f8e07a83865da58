"""Materialized JOIN views (sources/join_views.py): star-rollup state,
incremental fact-delta maintenance, loud full-recompute on dim change."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.join_views import (
    create_join_view,
    read_join_view,
    refresh_join_view,
)


@pytest.fixture()
def star(spark, tmp_path):
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    view = str(tmp_path / "jv")
    S.append(
        spark, fact,
        spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(20)],
            "fid int, key int, amt double",
        ),
    )
    S.append(
        spark, dim,
        spark.createDataFrame(
            [(k, f"seg{k % 2}") for k in range(4)], "key int, seg string"
        ),
    )
    create_join_view(
        spark, fact, dim, view, on=["key"], group_cols=["seg"],
        sum_cols="amt",
    )
    return fact, dim, view


def _direct(spark, fact, dim):
    return {
        (r.seg, r.n_rows, float(r.s))
        for r in S.read_snapshot(spark, fact)
        .join(S.read_snapshot(spark, dim), "key")
        .groupBy("seg")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("amt").cast("decimal(15,2)")).alias("s"),
        )
        .collect()
    }


def _view(spark, view):
    return {
        (r.seg, r.n_rows, float(r.sum_amt))
        for r in read_join_view(spark, view).collect()
    }


def test_initial_state_matches_direct_join(spark, star):
    fact, dim, view = star
    assert _view(spark, view) == _direct(spark, fact, dim)


def test_fact_append_refreshes_incrementally(spark, star):
    fact, dim, view = star
    S.append(
        spark, fact,
        spark.createDataFrame(
            [(100, 1, 50.0), (101, 3, 7.5)], "fid int, key int, amt double"
        ),
    )
    v, mode = refresh_join_view(spark, view)
    assert mode == "incremental"
    assert _view(spark, view) == _direct(spark, fact, dim)
    v2, mode2 = refresh_join_view(spark, view)
    assert mode2 == "noop" and v2 == v


def test_fact_delete_refreshes_incrementally_with_signs(spark, star):
    fact, dim, view = star
    S.delete_where(spark, fact, "key = 2")
    _, mode = refresh_join_view(spark, view)
    assert mode == "incremental"
    got = _view(spark, view)
    assert got == _direct(spark, fact, dim)
    # groups that lost every row vanish (n_rows > 0 invariant): key=2
    # fed seg0; seg0 still has key=0 rows so both segs remain, but the
    # counts dropped by the deleted rows
    assert sum(n for _, n, _ in got) == 15


def test_dim_change_forces_loud_full_recompute(spark, star):
    fact, dim, view = star
    S.delete_where(spark, dim, "key = 3")  # re-weights folded fact rows
    _, mode = refresh_join_view(spark, view)
    assert mode == "full"
    assert _view(spark, view) == _direct(spark, fact, dim)


def test_read_auto_refreshes_or_raises(spark, star):
    fact, dim, view = star
    S.append(
        spark, fact,
        spark.createDataFrame([(200, 0, 1.0)], "fid int, key int, amt double"),
    )
    with pytest.raises(RuntimeError, match="stale"):
        read_join_view(spark, view, auto_refresh=False)
    assert _view(spark, view) == _direct(spark, fact, dim)  # auto path


def test_mor_fact_delete_flows_through_cdc(spark, star):
    fact, dim, view = star
    S.delete_where_mor(spark, fact, "fid < 5")
    _, mode = refresh_join_view(spark, view)
    assert mode == "incremental"
    assert _view(spark, view) == _direct(spark, fact, dim)
