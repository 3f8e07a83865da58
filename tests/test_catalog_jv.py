"""Cataloged materialized JOIN views: CREATE MATERIALIZED JOIN VIEW /
SELECT with auto catch-up / REFRESH / drop guards through Catalog.sql."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(str(tmp_path / "cat"))
    c.create_table(
        spark, "fact",
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(12)],
            "fid int, key int, amt double",
        ),
    )
    c.create_table(
        spark, "dim",
        spark.createDataFrame(
            [(k, f"seg{k % 2}") for k in range(3)], "key int, seg string"
        ),
    )
    c.sql(
        spark,
        "CREATE MATERIALIZED JOIN VIEW sales AS "
        "SELECT seg, COUNT(*) AS n_rows, SUM(amt) AS sum_amt "
        "FROM fact JOIN dim USING (key) GROUP BY seg",
    )
    return c


def _direct(spark, c):
    return {
        (r.seg, r.n_rows, float(r.s))
        for r in c.read(spark, "fact")
        .join(c.read(spark, "dim"), "key")
        .groupBy("seg")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("amt").cast("decimal(15,2)")).alias("s"),
        )
        .collect()
    }


def _via_sql(spark, c):
    return {
        (r.seg, r.n_rows, float(r.sum_amt))
        for r in c.sql(
            spark, "SELECT seg, n_rows, sum_amt FROM sales"
        ).collect()
    }


def test_join_view_ddl_and_select(spark, cat):
    assert _via_sql(spark, cat) == _direct(spark, cat)


def test_select_auto_catches_up_after_fact_append(spark, cat):
    S.append(
        spark, cat.table_root("fact"),
        spark.createDataFrame([(100, 1, 40.0)], "fid int, key int, amt double"),
    )
    assert _via_sql(spark, cat) == _direct(spark, cat)  # caught up in SQL


def test_ddl_aliases_name_the_read_columns(spark, cat, tmp_path):
    cat.sql(
        spark,
        "CREATE MATERIALIZED JOIN VIEW sales2 AS "
        "SELECT seg, COUNT(*) AS n, SUM(amt) AS total "
        "FROM fact JOIN dim USING (key) GROUP BY seg",
    )
    df = cat.sql(spark, "SELECT seg, n, total FROM sales2")
    assert set(df.columns) == {"seg", "n", "total"}
    got = {(r.seg, r.n, float(r.total)) for r in df.collect()}
    assert got == _direct(spark, cat)
    cat.sql(spark, "DROP MATERIALIZED VIEW sales2")


def test_refresh_statement_and_drop_guards(spark, cat):
    S.append(
        spark, cat.table_root("fact"),
        spark.createDataFrame([(101, 2, 4.0)], "fid int, key int, amt double"),
    )
    cat.sql(spark, "REFRESH MATERIALIZED VIEW sales")
    assert _via_sql(spark, cat) == _direct(spark, cat)
    with pytest.raises(ValueError, match="sales"):
        cat.drop_table("fact")
    with pytest.raises(ValueError, match="sales"):
        cat.drop_table("dim")
    cat.sql(spark, "DROP MATERIALIZED VIEW sales")
    cat.drop_table("fact")  # guard released


def test_explain_reports_join_view_without_refreshing(spark, cat):
    import os

    from telemetry_parquet_spark.sources.join_views import join_view_info

    S.append(
        spark, cat.table_root("fact"),
        spark.createDataFrame([(400, 1, 3.0)], "fid int, key int, amt double"),
    )
    jv_root = os.path.join(cat.root, "_jv_sales")
    before = join_view_info(jv_root)["jv_fact_version"]
    rows = {
        r.aspect: r.detail
        for r in cat.sql(spark, "EXPLAIN SELECT * FROM sales").collect()
    }
    assert "mode=incremental" in rows["join_view"]
    assert "fact lag 1" in rows["join_view"]
    assert join_view_info(jv_root)["jv_fact_version"] == before  # no refresh
    S.delete_where(spark, cat.table_root("dim"), "key = 2")
    rows = {
        r.aspect: r.detail
        for r in cat.sql(spark, "EXPLAIN SELECT * FROM sales").collect()
    }
    assert "mode=full" in rows["join_view"]


def test_avg_is_rejected_in_join_view_ddl(spark, cat):
    with pytest.raises(ValueError, match="AVG is not"):
        cat.sql(
            spark,
            "CREATE MATERIALIZED JOIN VIEW bad AS "
            "SELECT seg, AVG(amt) AS a FROM fact JOIN dim USING (key) "
            "GROUP BY seg",
        )


def test_vacuum_keeps_stale_view_base_versions_alive(spark, cat):
    """A join view left stale across two base appends must survive
    catalog vacuum: its recorded base version is what the incremental
    catch-up diffs from, so retention pins it."""
    for i in range(2):  # fact advances to v3; view still records v1
        S.append(
            spark, cat.table_root("fact"),
            spark.createDataFrame(
                [(600 + i, 0, 1.0)], "fid int, key int, amt double"
            ),
        )
    cat.vacuum(keep_last_catalog=1, keep_last_table=1)
    # the catch-up (incremental, diffing from the pinned v1) still works
    assert {
        (r.seg, r.n_rows) for r in cat.read_join_view(spark, "sales").collect()
    } == {(s, n) for s, n, _ in _direct(spark, cat)}


def test_incremental_refresh_keeps_state_schema_stable(spark, cat):
    import os

    from telemetry_parquet_spark.sources.join_views import refresh_join_view

    jv_root = os.path.join(cat.root, "_jv_sales")
    schema0 = S.read_snapshot(spark, jv_root).schema
    for i in range(2):
        S.append(
            spark, cat.table_root("fact"),
            spark.createDataFrame(
                [(700 + i, 1, 2.0)], "fid int, key int, amt double"
            ),
        )
        _, mode = refresh_join_view(spark, jv_root)
        assert mode == "incremental"
        assert S.read_snapshot(spark, jv_root).schema == schema0
    # cross-version read under one schema: the drift bug broke this
    S.table_changes(spark, jv_root, 1, S.latest_version(jv_root)).count()


def test_catalog_vacuum_covers_view_state_tables(spark, cat):
    import os

    # two refresh versions of the join view's state table
    S.append(
        spark, cat.table_root("fact"),
        spark.createDataFrame([(300, 0, 2.0)], "fid int, key int, amt double"),
    )
    cat.sql(spark, "REFRESH MATERIALIZED VIEW sales")
    jv_root = os.path.join(cat.root, "_jv_sales")
    assert S.latest_version(jv_root) >= 2
    removed = cat.vacuum(keep_last_catalog=1, keep_last_table=1)
    assert "sales" in removed  # view state table was retention-managed
    # the surviving head still answers correctly after vacuum
    assert {
        (r.seg, r.n_rows) for r in cat.read_join_view(spark, "sales").collect()
    } == {(s, n) for s, n, _ in _direct(spark, cat)}
