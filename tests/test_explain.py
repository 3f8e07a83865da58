"""EXPLAIN through the SQL front door (sources/sql_front.py::explain_sql):
routing decisions — MV rewrite vs scan vs mutator, per-reference version
pins with manifest footprints, result-cache hit/miss — reported from
manifests alone, with proof that NOTHING executes (no commit, no view
refresh, no cache entry)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.result_cache import cached_sql
from telemetry_parquet_spark.sources.sql_front import engine_sql, explain_sql
from telemetry_parquet_spark.sources.views import create_view, view_info


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(40)], "k int, g int, x double"
    )
    S.append(spark, root, df)
    return root


def _aspects(df) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for r in df.collect():
        out.setdefault(r.aspect, []).append(r.detail)
    return out


def test_explain_select_pins_head_without_scanning(spark, table):
    t = {"t": table}
    df = engine_sql(spark, "EXPLAIN SELECT * FROM t WHERE k > 5", tables=t)
    a = _aspects(df)
    assert a["statement"] == ["query"]
    assert a["route"] == ["scan"]
    (pin,) = a["pin"]
    m = S.read_manifest(table, 1)
    assert pin.startswith("t @ v1 (HEAD)")
    assert f"{len(m['files'])} files" in pin
    assert f"{sum(m['sizes'].values())} bytes" in pin
    # EXPLAIN's own result carries no parquet scan — metadata rows only
    assert df.inputFiles() == []


def test_explain_time_travel_pins_each_reference(spark, table):
    S.append(spark, table, S.read_snapshot(spark, table, 1))  # v2 doubles
    S.create_tag(table, "gold", 1)
    df = explain_sql(
        spark,
        "SELECT a.k FROM t VERSION AS OF 1 a "
        "JOIN t VERSION AS OF 'gold' b ON a.k = b.k",
        tables={"t": table},
    )
    pins = _aspects(df)["pin"]
    assert len(pins) == 2
    assert any("t @ v1 (1)" in p for p in pins)
    assert any("t @ v1 ('gold')" in p for p in pins)


def test_explain_mv_route_reports_staleness_without_refreshing(
    spark, table, tmp_path
):
    view = str(tmp_path / "mv")
    create_view(spark, table, view, ["g"], "x")
    t, v = {"t": table}, {"t": [view]}
    sql = "SELECT g, COUNT(*) AS n, SUM(x) AS s FROM t GROUP BY g"
    a = _aspects(engine_sql(spark, "EXPLAIN " + sql, tables=t, views=v))
    assert a["route"] == [f"materialized-view {view}"]
    assert "lag 0 commits" in a["view_staleness"][0]

    # move the base: EXPLAIN must report the lag but NOT catch the view up
    S.append(spark, table, S.read_snapshot(spark, table, 1))
    before = view_info(view)["mv_base_version"]
    a = _aspects(engine_sql(spark, "EXPLAIN " + sql, tables=t, views=v))
    assert "lag 1 commits (incremental catch-up at read)" in (
        a["view_staleness"][0]
    )
    assert view_info(view)["mv_base_version"] == before  # no refresh ran


def test_explain_mv_miss_reason_and_scan_fallback(spark, table, tmp_path):
    view = str(tmp_path / "mv")
    create_view(spark, table, view, ["g"], "x")
    # k is not in the view's grouping -> per-view miss reason + scan route
    a = _aspects(
        explain_sql(
            spark,
            "SELECT k, COUNT(*) AS n FROM t GROUP BY k",
            tables={"t": table},
            views={"t": [view]},
        )
    )
    assert a["route"] == ["scan"]
    assert "not subsumed" in a["mv_miss"][0]


def test_explain_dml_routes_to_mutator_without_committing(spark, table):
    head = S.latest_version(table)
    a = _aspects(
        engine_sql(spark, "EXPLAIN DELETE FROM t WHERE k < 3", tables={"t": table})
    )
    assert "copy-on-write" in a["statement"][0]
    assert a["route"] == ["commit-log mutator"]
    assert S.latest_version(table) == head  # nothing committed
    a = _aspects(
        engine_sql(spark, "EXPLAIN UPDATE t SET x = 0 WHERE k = 1", tables={"t": table})
    )
    assert "merge-on-read" in a["statement"][0]
    assert S.latest_version(table) == head


def test_explain_result_cache_hit_miss_rekeys_on_commit(
    spark, table, tmp_path
):
    cache = str(tmp_path / "cache")
    t = {"t": table}
    sql = "SELECT COUNT(*) AS n FROM t"
    a = _aspects(explain_sql(spark, sql, t, cache_dir=cache))
    assert a["result_cache"][0].startswith("miss")
    cached_sql(spark, sql, t, cache)
    a = _aspects(explain_sql(spark, sql, t, cache_dir=cache))
    assert a["result_cache"][0].startswith("hit")
    # EXPLAIN itself must not have installed anything beyond that entry
    assert len(os.listdir(cache)) == 1
    S.append(spark, table, S.read_snapshot(spark, table, 1))
    a = _aspects(explain_sql(spark, sql, t, cache_dir=cache))
    assert a["result_cache"][0].startswith("miss")  # commit re-keyed
