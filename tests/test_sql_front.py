"""SQL front door tests (sources/sql_front.py): VERSION AS OF /
TIMESTAMP AS OF rewriting onto manifest-pinned snapshot reads, bare-name
HEAD resolution, DESCRIBE HISTORY, and cross-version joins as one
statement."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources.snapshots import (
    append,
    delete_where,
    read_manifest,
    read_snapshot,
)
from telemetry_parquet_spark.sources.sql_front import (
    describe_history,
    engine_sql,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    """v1 = orderkey%10<7, v2 = full orders, v3 = minus '1-URGENT'."""
    root = str(tmp_path / "tbl")
    orders = _orders(spark, sf_dir)
    append(spark, root, orders.where(F.col("o_orderkey") % 10 < 7))
    append(spark, root, orders.where(F.col("o_orderkey") % 10 >= 7))
    delete_where(spark, root, "o_orderpriority = '1-URGENT'")
    return root


def test_version_as_of_matches_read_snapshot(spark, table):
    for v in (1, 2, 3):
        got = engine_sql(
            spark,
            f"SELECT * FROM t VERSION AS OF {v}",
            tables={"t": table},
        )
        assert _multiset(got) == _multiset(read_snapshot(spark, table, v))


def test_bare_name_is_head(spark, table):
    got = engine_sql(spark, "SELECT COUNT(*) AS n FROM t", {"t": table})
    assert got.first().n == read_snapshot(spark, table).count()


def test_timestamp_as_of_resolves_between_commits(spark, table):
    t1 = read_manifest(table, 1)["committed_at"]
    t2 = read_manifest(table, 2)["committed_at"]
    if t2 <= t1:
        pytest.skip("commit timestamps not distinct on this run")
    # a timestamp at (or just after) v1's commit but before v2's sees v1
    ts = t1 + min(1e-4, (t2 - t1) / 2)
    got = engine_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF {ts!r}",
        tables={"t": table},
    )
    assert got.first().n == read_snapshot(spark, table, 1).count()
    # before the table existed -> loud error
    with pytest.raises(FileNotFoundError):
        engine_sql(
            spark,
            f"SELECT * FROM t TIMESTAMP AS OF {t1 - 10.0!r}",
            tables={"t": table},
        )


def test_cross_version_join_single_statement(spark, table):
    out = engine_sql(
        spark,
        """
        SELECT a.n - b.n AS n_deleted
        FROM (SELECT COUNT(*) AS n FROM t VERSION AS OF 2) a
        CROSS JOIN (SELECT COUNT(*) AS n FROM t VERSION AS OF 3) b
        """,
        tables={"t": table},
    ).first()
    expected = (
        read_snapshot(spark, table, 2)
        .where(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert out.n_deleted == expected


def test_describe_history(spark, table):
    rows = engine_sql(
        spark, "DESCRIBE HISTORY t", tables={"t": table}
    ).collect()
    assert [r.version for r in rows] == [0, 1, 2, 3]
    assert [r.action for r in rows] == [
        "create", "append", "append", "delete",
    ]
    assert rows[0].parent is None and rows[3].parent == 2
    # and the function form agrees
    assert _multiset(describe_history(spark, table)) == sorted(
        tuple(r) for r in rows
    )


def test_unknown_history_table_raises(spark, table):
    with pytest.raises(KeyError):
        engine_sql(spark, "DESCRIBE HISTORY nope", tables={"t": table})
