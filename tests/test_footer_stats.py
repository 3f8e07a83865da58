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


def test_file_footer_stats_partial_row_group_invalidation(tmp_path):
    """Folded file stats must be TRUE bounds/totals or absent: a row
    group with statistics disabled drops the column's min/max AND null
    count (partial totals would defeat pruning and the GROUP BY NULL-key
    guard), while an all-NULL row group keeps the bounds (it adds no
    values) and extends the null total."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from telemetry_parquet_spark.sources.snapshots import _file_footer_stats

    # rg0 values + rg1 all-NULL: bounds kept, nulls counted
    p1 = str(tmp_path / "f1.parquet")
    w = pq.ParquetWriter(
        p1, pa.schema([("k", pa.string()), ("x", pa.int64())])
    )
    w.write_table(pa.table({"k": ["A", "A"], "x": [1, 2]}))
    w.write_table(
        pa.table(
            {
                "k": pa.array([None, None, None], pa.string()),
                "x": pa.array([None, None, None], pa.int64()),
            }
        )
    )
    w.close()
    st, _, nl, n = _file_footer_stats(p1)
    assert st["k"] == ["A", "A"] and st["x"] == [1, 2]
    assert nl["k"] == 3 and nl["x"] == 3 and n == 5

    # statistics disabled: neither bounds nor null counts may survive
    p2 = str(tmp_path / "f2.parquet")
    pq.write_table(
        pa.table({"k": ["A", "B"], "x": [1, 2]}), p2,
        write_statistics=False,
    )
    st2, _, nl2, n2 = _file_footer_stats(p2)
    assert "k" not in st2 and "x" not in st2
    assert "k" not in nl2 and "x" not in nl2
    assert n2 == 2
