"""Materialized-view query rewrite (sources/views.py): subsumption
matching, staleness + incremental catch-up, fallback, and the
only-the-view-is-scanned proof."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.views import (
    Agg,
    RewriteMiss,
    answer_aggregate,
    create_view,
    refresh_view,
    rewrite_aggregate,
)


@pytest.fixture()
def base(spark, tmp_path):
    """A small snapshot base table (a, b, x) + its (a, b) view."""
    root = str(tmp_path / "base")
    rows = [(i % 3, i % 2, float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "a int, b int, x double")
    S.append(spark, root, df)
    view = str(tmp_path / "view")
    create_view(spark, root, view, ["a", "b"], "x")
    return root, view


def _direct(spark, root, group_cols):
    base_df = S.read_snapshot(spark, root)
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(15,2)"))
        .cast("decimal(25,2)")
        .alias("s"),
    ]
    df = base_df.groupBy(*group_cols).agg(*aggs) if group_cols else base_df.agg(*aggs)
    return sorted(map(tuple, df.collect()))


def test_rewrite_scans_only_view_files(spark, base):
    root, view = base
    out = rewrite_aggregate(
        spark, view, ["a"], [Agg("count", alias="n"), Agg("sum", "x", "s")]
    )
    files = out.inputFiles()
    assert files, "rewritten plan has no file scan?"
    assert all(os.path.abspath(view) in f for f in files), files
    assert sorted(map(tuple, out.collect())) == _direct(spark, root, ["a"])


def test_rollup_subset_and_global(spark, base):
    root, view = base
    for cols in (["a", "b"], ["b"], []):
        got = rewrite_aggregate(
            spark, view, cols, [Agg("count", alias="n"), Agg("sum", "x", "s")]
        )
        assert sorted(map(tuple, got.collect())) == _direct(spark, root, cols)


def test_miss_on_unsubsumed_group_or_agg(spark, base):
    _, view = base
    with pytest.raises(RewriteMiss, match="not subsumed"):
        rewrite_aggregate(spark, view, ["x"], [Agg("count")])
    with pytest.raises(RewriteMiss, match="not derivable"):
        rewrite_aggregate(spark, view, ["a"], [Agg("sum", "b")])
    with pytest.raises(RewriteMiss, match="not derivable"):
        rewrite_aggregate(spark, view, ["a"], [Agg("min", "x")])


def test_stale_view_auto_refreshes_through_append_and_delete(spark, base, tmp_path):
    root, view = base
    extra = spark.createDataFrame(
        [(0, 0, 1000.5), (7, 1, 2.25)], "a int, b int, x double"
    )
    S.append(spark, root, extra)
    S.delete_where(spark, root, "a = 1")
    out = rewrite_aggregate(
        spark, view, ["a"], [Agg("count", alias="n"), Agg("sum", "x", "s")]
    )
    assert sorted(map(tuple, out.collect())) == _direct(spark, root, ["a"])
    # the refresh rolled the view's recorded base version to head
    m = S.read_manifest(view, S.latest_version(view))
    assert m["mv_base_version"] == S.latest_version(root)
    # deleting ALL of a group (a=1) removed its rows from the view state
    assert S.read_snapshot(spark, view).where("a = 1").count() == 0


def test_stale_without_auto_refresh_misses(spark, base):
    root, view = base
    S.append(
        spark, root, spark.createDataFrame([(0, 0, 1.0)], "a int, b int, x double")
    )
    with pytest.raises(RewriteMiss, match="stale"):
        rewrite_aggregate(spark, view, ["a"], [Agg("count")], auto_refresh=False)


def test_refresh_noop_when_fresh(spark, base):
    _, view = base
    v = S.latest_version(view)
    assert refresh_view(spark, view) == v
    assert S.latest_version(view) == v


def test_avg_derivation_matches_direct_double_division(spark, base):
    root, view = base
    out = rewrite_aggregate(spark, view, ["b"], [Agg("avg", "x", "avg_x")])
    base_df = S.read_snapshot(spark, root)
    direct = base_df.groupBy("b").agg(
        (
            F.sum(F.col("x").cast("decimal(15,2)")).cast("double")
            / F.count("*").cast("double")
        ).alias("avg_x")
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_answer_front_door_fallback_and_require(spark, base):
    root, view = base
    # no view subsumes GROUP BY x -> fallback answers from base
    df, used = answer_aggregate(
        spark, root, [view], ["x"], [Agg("count", alias="n")]
    )
    assert used is None and df.count() > 0
    with pytest.raises(RuntimeError, match="no materialized view"):
        answer_aggregate(
            spark, root, [view], ["x"], [Agg("count")], require_rewrite=True
        )
    # subsumed -> answered by the view, reported as such
    df, used = answer_aggregate(
        spark, root, [view], ["a"], [Agg("count", alias="n")],
        require_rewrite=True,
    )
    assert used == view
    # a view over a DIFFERENT base never answers for this one
    other = str(os.path.join(os.path.dirname(root), "other"))
    S.append(spark, other, spark.createDataFrame([(1, 1, 1.0)], "a int, b int, x double"))
    other_view = other + "_v"
    create_view(spark, other, other_view, ["a"], "x")
    with pytest.raises(RuntimeError, match="no materialized view"):
        answer_aggregate(
            spark, root, [other_view], ["a"], [Agg("count")],
            require_rewrite=True,
        )


def test_multi_measure_view_sums_and_avgs(spark, tmp_path):
    """A view materializing several measures answers SUM/AVG on each;
    staleness catch-up maintains every measure's total exactly."""
    from pyspark.sql import functions as F2

    root = str(tmp_path / "mm_base")
    rows = [(i % 4, float(i), float(i) * 0.5) for i in range(80)]
    df = spark.createDataFrame(rows, "a int, x double, y double")
    S.append(spark, root, df)
    view = str(tmp_path / "mm_view")
    create_view(spark, root, view, ["a"], ["x", "y"])
    S.append(
        spark, root,
        spark.createDataFrame([(0, 7.25, 3.5), (9, 1.0, 2.0)],
                              "a int, x double, y double"),
    )
    S.delete_where(spark, root, "a = 2")
    out = rewrite_aggregate(
        spark, view, [],
        [
            Agg("count", alias="n"),
            Agg("sum", "x", "sx"),
            Agg("sum", "y", "sy"),
            Agg("avg", "y", "ay"),
        ],
    )
    base_df = S.read_snapshot(spark, root)
    direct = base_df.agg(
        F2.count("*").alias("n"),
        F2.sum(F2.col("x").cast("decimal(15,2)")).cast("decimal(25,2)").alias("sx"),
        F2.sum(F2.col("y").cast("decimal(15,2)")).cast("decimal(25,2)").alias("sy"),
        (
            F2.sum(F2.col("y").cast("decimal(15,2)")).cast("double")
            / F2.count("*").cast("double")
        ).alias("ay"),
    )
    assert out.collect() == direct.collect()
    # a measure the view does NOT materialize misses
    with pytest.raises(RewriteMiss, match="not derivable"):
        rewrite_aggregate(spark, view, [], [Agg("sum", "a")])


def test_sql_front_door_routes_through_view(spark, base):
    """engine_sql(views=...): a plain GROUP-BY aggregate answers from the
    MV (inputFiles proves it), unsupported shapes fall back to the scan."""
    from telemetry_parquet_spark.sources.sql_front import engine_sql

    root, view = base
    t, v = {"t": root}, {"t": [view]}
    out = engine_sql(
        spark,
        "SELECT a, COUNT(*) AS n, SUM(x) AS s, AVG(x) AS m "
        "FROM t GROUP BY a",
        tables=t, views=v,
    )
    assert out.columns == ["a", "n", "s", "m"]
    assert all(os.path.abspath(view) in f for f in out.inputFiles())
    want = engine_sql(
        spark,
        "SELECT a, COUNT(*) AS n, "
        "CAST(SUM(CAST(x AS DECIMAL(15,2))) AS DECIMAL(25,2)) AS s, "
        "CAST(SUM(CAST(x AS DECIMAL(15,2))) AS DOUBLE)/COUNT(*) AS m "
        "FROM t GROUP BY a",
        tables=t,
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, want.collect()))
    # global aggregate (no GROUP BY) routes too
    g = engine_sql(spark, "SELECT COUNT(*) AS n FROM t", tables=t, views=v)
    assert all(os.path.abspath(view) in f for f in g.inputFiles())
    assert g.first().n == S.read_snapshot(spark, root).count()
    # WHERE clause -> not the restricted shape -> honest fact-table scan
    w = engine_sql(
        spark, "SELECT COUNT(*) AS n FROM t WHERE a = 1", tables=t, views=v
    )
    assert any(os.path.abspath(root) in f for f in w.inputFiles())
    assert w.first().n == S.read_snapshot(spark, root).where("a = 1").count()
    # MIN isn't derivable -> falls back, still correct
    mn = engine_sql(
        spark, "SELECT a, MIN(x) AS lo FROM t GROUP BY a", tables=t, views=v
    )
    assert any(os.path.abspath(root) in f for f in mn.inputFiles())


def test_avg_ignores_nulls_like_sql(spark, tmp_path):
    """SQL AVG divides by the NON-NULL count; sum/n_rows would
    understate it on nullable measures (both the rewrite and the
    fallback were wrong before per-measure counts existed)."""
    root = str(tmp_path / "b")
    df = spark.createDataFrame(
        [(0, 2.0), (0, None), (1, 4.0)], "a int, x double"
    )
    S.append(spark, root, df)
    view = str(tmp_path / "v")
    create_view(spark, root, view, ["a"], "x")
    got = {
        r.a: r.m
        for r in rewrite_aggregate(
            spark, view, ["a"], [Agg("avg", "x", "m")]
        ).collect()
    }
    assert got == {0: 2.0, 1: 4.0}  # not {0: 1.0} (sum/n_rows)
    # incremental refresh maintains the non-null counts too
    S.append(
        spark, root,
        spark.createDataFrame([(0, None), (0, 6.0)], "a int, x double"),
    )
    got = {
        r.a: r.m
        for r in rewrite_aggregate(
            spark, view, ["a"], [Agg("avg", "x", "m")]
        ).collect()
    }
    assert got[0] == 4.0  # (2+6)/2 non-null values
    # the counts marker must SURVIVE the refresh commit: a second
    # rewrite after catch-up reads the refreshed manifest
    got = {
        r.a: r.m
        for r in rewrite_aggregate(
            spark, view, ["a"], [Agg("avg", "x", "m")]
        ).collect()
    }
    assert got[0] == 4.0
    # fallback path agrees with SQL semantics
    out, used = answer_aggregate(
        spark, root, [], ["a"], [Agg("avg", "x", "m")]
    )
    assert used is None
    assert {r.a: r.m for r in out.collect()}[0] == 4.0


def test_custom_cast_scale_is_preserved(spark, tmp_path):
    """cast_to='decimal(20,4)' must keep 4-decimal totals — the
    hard-coded decimal(25,2) silently rounded finer scales."""
    root = str(tmp_path / "b")
    S.append(
        spark, root,
        spark.createDataFrame(
            [(0, 0.0001), (0, 0.0002)], "a int, x double"
        ),
    )
    view = str(tmp_path / "v")
    create_view(spark, root, view, ["a"], "x", cast_to="decimal(20,4)")
    r = rewrite_aggregate(
        spark, view, ["a"], [Agg("sum", "x", "s")]
    ).first()
    assert float(r.s) == pytest.approx(0.0003)


def test_broken_view_falls_back_to_scan(spark, tmp_path):
    """A view whose root is not a view (the create race shape) must not
    fail the query — the base scan serves."""
    root = str(tmp_path / "b")
    S.append(spark, root, spark.createDataFrame([(0, 1.0)], "a int, x double"))
    not_a_view = str(tmp_path / "nv")
    S.append(spark, not_a_view, spark.createDataFrame([(1,)], "k int"))
    out, used = answer_aggregate(
        spark, root, [not_a_view], ["a"], [Agg("count", alias="n")]
    )
    assert used is None and out.first().n == 1
