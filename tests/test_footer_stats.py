"""footer_stats (sources/writers.py): metadata-only aggregates — engagement
is asserted, confs are restored, results equal the full scan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources.writers import footer_stats


def test_matches_full_scan(spark, sf_dir):
    path = os.path.join(sf_dir, "orders.parquet")
    got = footer_stats(
        spark, path, min_cols=("o_totalprice",), max_cols=("o_totalprice",)
    ).collect()[0]
    full = (
        spark.read.parquet(path)
        .agg(
            F.count("*").alias("cnt"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )
        .collect()[0]
    )
    assert (got.cnt, got.min_o_totalprice, got.max_o_totalprice) == (
        full.cnt,
        full.mn,
        full.mx,
    )


def test_confs_restored(spark, sf_dir):
    before = (
        spark.conf.get("spark.sql.sources.useV1SourceList", None),
        spark.conf.get("spark.sql.parquet.aggregatePushdown", None),
    )
    footer_stats(spark, os.path.join(sf_dir, "orders.parquet"))
    after = (
        spark.conf.get("spark.sql.sources.useV1SourceList", None),
        spark.conf.get("spark.sql.parquet.aggregatePushdown", None),
    )
    assert before == after
    # and the ordinary v1 path still plans FileScan (not BatchScan)
    plan = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .groupBy()
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchScan" not in plan


def test_raises_when_pushdown_cannot_engage(spark, tmp_path):
    """Nested columns cannot answer from footers — the helper must refuse
    loudly rather than silently full-scan."""
    p = str(tmp_path / "nested.parquet")
    spark.createDataFrame(
        [(1, {"a": 1})], "id long, s struct<a:long>"
    ).write.parquet(p)
    with pytest.raises(RuntimeError, match="pushdown did not engage"):
        footer_stats(spark, p, min_cols=("s.a",))
