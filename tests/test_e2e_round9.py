"""Round-9 composition: every new table-service feature in ONE
lifecycle on one table — WAP staging, merge-with-evolution, MOR update,
temporal manifest stats, the secondary Bloom index through a DV-aware
planned scan, compaction, tags, vacuum, DESCRIBE DETAIL — asserting the
final content equals an independently computed relational expectation.
The point is compositionality: each feature is gated on its own
elsewhere; this proves they stack on one commit log without stepping on
each other."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def test_round9_features_compose(spark, sf_dir, tmp_path):
    from telemetry_parquet_spark.sources.scan_planner import Eq, Range
    from telemetry_parquet_spark.sources.snapshots import (
        append,
        compact_table,
        create_tag,
        merge_into,
        plan_snapshot_scan,
        publish_staged,
        read_snapshot,
        stage_append,
        update_snapshot_bloom,
        update_where_mor,
        vacuum,
    )
    from telemetry_parquet_spark.sources.sql_front import engine_sql

    root = str(tmp_path / "life")
    orders = _orders(spark, sf_dir)
    dec = F.col("o_orderkey") % 10

    # v1: base append; index the key column while the table is small
    append(spark, root, orders.where(dec < 6))
    update_snapshot_bloom(spark, root, "o_orderkey")
    create_tag(root, "genesis", 1)

    # WAP: stage the daily batch, audit it, publish (v2)
    stage_append(spark, root, orders.where(dec.isin(6, 7)), "daily")
    publish_staged(
        spark, root, "daily",
        audits=[
            lambda df: (_ for _ in ()).throw(AssertionError("empty batch"))
            if df.limit(1).count() == 0
            else None
        ],
    )

    # v3: MERGE with schema evolution (adds o_channel)
    source = (
        orders.where((F.col("o_orderkey") % 20 < 4) | (dec == 8))
        .withColumn("o_orderpriority", F.lit("MERGED"))
        .withColumn("o_channel", F.lit("WEB"))
    )
    merge_into(spark, root, source, keys=["o_orderkey"], allow_evolution=True)

    # v4: MOR update over the evolved table (deletion vector + copies)
    update_where_mor(
        spark, root, "o_orderpriority = '1-URGENT'",
        {"o_orderpriority": "'URGENT-X'"},
    )

    # expected state, computed relationally from the source table
    merged_keys = F.col("o_orderkey") % 20 < 4
    expected = (
        orders.where(dec <= 8)
        .withColumn(
            "o_channel",
            F.when(merged_keys | (dec == 8), F.lit("WEB")),
        )
        .withColumn(
            "o_orderpriority",
            F.when(merged_keys | (dec == 8), F.lit("MERGED")).otherwise(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT",
                    F.lit("URGENT-X"),
                ).otherwise(F.col("o_orderpriority"))
            ),
        )
    )
    assert _multiset(read_snapshot(spark, root)) == _multiset(expected)

    # DV-aware planned scan: temporal manifest stats + stale Bloom index
    # (covers only v1's files — uncovered files must be kept) in one call
    ok = int(orders.agg(F.min("o_orderkey")).first()[0])
    df, plan = plan_snapshot_scan(
        spark, root,
        [Range("o_orderdate", "1996-01-01T00:00:00", "2005-01-01T00:00:00"),
         Eq("o_orderkey", ok)],
        allow_dv=True,
    )
    assert _multiset(df) == _multiset(
        expected.where(
            (F.col("o_orderkey") == ok)
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        )
    )
    assert [n for n, _ in plan.steps] == [
        "manifest:o_orderdate", "bloom:o_orderkey",
    ]

    # compaction materializes the DV; bloom catch-up covers the rewrite
    compact_table(spark, root, target_bytes=64 * 1024 * 1024)
    assert update_snapshot_bloom(spark, root, "o_orderkey") >= 1
    assert _multiset(read_snapshot(spark, root)) == _multiset(expected)

    # vacuum: everything but the head and the tagged genesis goes
    removed = vacuum(root, keep_last=1)
    assert removed
    assert _multiset(read_snapshot(spark, root)) == _multiset(expected)
    assert _multiset(read_snapshot(spark, root, "genesis")) == _multiset(
        orders.where(dec < 6)
    )

    # DESCRIBE DETAIL reflects the composed end state
    row = engine_sql(
        spark, "DESCRIBE DETAIL t", tables={"t": root}
    ).first()
    assert row.action == "compact" and row.n_dv == 0
    assert row.n_columns == 7  # evolved schema
    assert row.tags == "genesis" and row.staged == ""
