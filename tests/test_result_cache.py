"""Version-pinned result cache (sources/result_cache.py): hit/miss
addressing, commit-driven re-keying, exactness, and stale eviction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.result_cache import (
    cached_sql,
    evict_stale,
)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    S.append(
        spark, root,
        spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")
        ),
    )
    return root


def test_miss_then_hit_bit_equal(spark, table, tmp_path):
    cache = str(tmp_path / "cache")
    sql = "SELECT g, COUNT(*) AS n FROM t GROUP BY g"
    t = {"t": table}
    first, hit1 = cached_sql(spark, sql, t, cache)
    assert not hit1
    second, hit2 = cached_sql(spark, sql, t, cache)
    assert hit2
    assert sorted(map(tuple, first.collect())) == sorted(
        map(tuple, second.collect())
    )
    # the hit serves the persisted artifact, not the base table
    assert all(os.path.abspath(cache) in f for f in second.inputFiles())
    assert first.schema == second.schema


def test_commit_rekeys_automatically(spark, table, tmp_path):
    cache = str(tmp_path / "cache")
    sql = "SELECT COUNT(*) AS n FROM t"
    t = {"t": table}
    a, _ = cached_sql(spark, sql, t, cache)
    assert a.first().n == 100
    S.append(
        spark, table,
        spark.createDataFrame([(1000, 0)], "k long, g long"),
    )
    b, hit = cached_sql(spark, sql, t, cache)
    assert not hit  # head moved -> new key -> recompute
    assert b.first().n == 101
    # different statements never collide
    c, hit = cached_sql(spark, "SELECT MAX(k) AS m FROM t", t, cache)
    assert not hit and c.first().m == 1000


def test_time_travel_statements_cache_per_version_text(spark, table, tmp_path):
    cache = str(tmp_path / "cache")
    t = {"t": table}
    v1, _ = cached_sql(
        spark, "SELECT COUNT(*) AS n FROM t VERSION AS OF 1", t, cache
    )
    S.delete_where(spark, table, "g = 0")
    # same STATEMENT, new head version -> recomputed (conservative: the
    # pin covers the table, not the parsed AS OF version)
    v1b, hit = cached_sql(
        spark, "SELECT COUNT(*) AS n FROM t VERSION AS OF 1", t, cache
    )
    assert not hit and v1b.first().n == v1.first().n == 100


def test_evict_stale_removes_only_superseded(spark, table, tmp_path):
    cache = str(tmp_path / "cache")
    t = {"t": table}
    cached_sql(spark, "SELECT COUNT(*) AS n FROM t", t, cache)
    S.append(
        spark, table, spark.createDataFrame([(7, 7)], "k long, g long")
    )
    cached_sql(spark, "SELECT COUNT(*) AS n FROM t", t, cache)
    gone = evict_stale(cache)
    assert len(gone) == 1
    # the current-head entry still serves
    _, hit = cached_sql(spark, "SELECT COUNT(*) AS n FROM t", t, cache)
    assert hit
