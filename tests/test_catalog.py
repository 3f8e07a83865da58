"""Catalog (sources/catalog.py): named namespace + SQL DDL over the
whole table-service surface — CTAS, CREATE/REFRESH/DROP MATERIALIZED
VIEW, automatic MV routing, and the dependent-view drop guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(str(tmp_path / "cat"))
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 2).alias("h"),
        (F.col("id") * 1.5).alias("x"),
    )
    c.create_table(spark, "facts", df)
    return c


def test_ctas_from_time_travel_and_registry_persists(spark, cat, tmp_path):
    S.append(
        spark, cat.table_root("facts"),
        spark.range(100, 120).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("g"),
            (F.col("id") % 2).alias("h"), (F.col("id") * 1.5).alias("x"),
        ),
    )
    r = cat.sql(
        spark,
        "CREATE TABLE early AS SELECT k, g FROM facts VERSION AS OF 1 "
        "WHERE k < 50",
    )
    assert r.first().n_rows == 50
    # a NEW Catalog object on the same root sees the registry
    c2 = Catalog(cat.root)
    assert c2.sql(spark, "SELECT COUNT(*) AS n FROM early").first().n == 50
    with pytest.raises(ValueError, match="already cataloged"):
        c2.create_table(spark, "early", spark.range(1))


def test_create_mv_routes_group_by_automatically(spark, cat):
    cat.sql(
        spark,
        "CREATE MATERIALIZED VIEW gx AS "
        "SELECT g, h, COUNT(*), SUM(x) FROM facts GROUP BY g, h",
    )
    out = cat.sql(
        spark, "SELECT g, COUNT(*) AS n, SUM(x) AS s FROM facts GROUP BY g"
    )
    mv_root = os.path.join(cat.root, "_mv_gx")
    assert all(os.path.abspath(mv_root) in f for f in out.inputFiles())
    direct = (
        S.read_snapshot(spark, cat.table_root("facts"))
        .groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast("decimal(15,2)"))
            .cast("decimal(25,2)")
            .alias("s"),
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_mv_stays_fresh_through_dml_and_refresh(spark, cat):
    cat.sql(
        spark,
        "CREATE MATERIALIZED VIEW gx AS "
        "SELECT g, COUNT(*), SUM(x) FROM facts GROUP BY g",
    )
    cat.sql(spark, "DELETE FROM facts WHERE g = 3")
    r = cat.sql(spark, "REFRESH MATERIALIZED VIEW gx").first()
    assert r.view == "gx" and r.version >= 2
    out = cat.sql(spark, "SELECT g, COUNT(*) AS n FROM facts GROUP BY g")
    assert sorted(x.g for x in out.collect()) == [0, 1, 2]
    # auto-refresh inside the rewrite also works without explicit REFRESH
    cat.sql(
        spark,
        "INSERT INTO facts SELECT k, g, h, x FROM facts VERSION AS OF 1 "
        "WHERE k >= 990",
    )
    n = cat.sql(spark, "SELECT COUNT(*) AS n FROM facts GROUP BY g").count()
    assert n == 3


def test_drop_guards_and_unsupported_mv_shape(spark, cat):
    cat.sql(
        spark,
        "CREATE MATERIALIZED VIEW gx AS "
        "SELECT g, COUNT(*) FROM facts GROUP BY g",
    )
    with pytest.raises(ValueError, match="materialized views"):
        cat.sql(spark, "DROP TABLE facts")
    cat.sql(spark, "DROP MATERIALIZED VIEW gx")
    with pytest.raises(ValueError, match="unsupported select item"):
        cat.sql(
            spark,
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT g, MIN(x) FROM facts GROUP BY g",
        )
    cat.sql(spark, "DROP TABLE facts")
    with pytest.raises(KeyError):
        cat.table_root("facts")
