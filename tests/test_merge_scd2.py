"""MERGE upsert + SCD2 emulation tests, and streaming checkpoint resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.operators.merge import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "old-a", 10), (2, "old-b", 20), (3, "old-c", 30)], ["id", "v", "n"]
    )
    source = spark.createDataFrame(
        [(2, "new-b", 99), (4, "new-d", 40)], ["id", "v", "n"]
    )
    merged = merge_upsert(target, source, keys=["id"])
    got = {r.id: (r.v, r.n) for r in merged.collect()}
    assert got == {
        1: ("old-a", 10),
        2: ("new-b", 99),   # updated
        3: ("old-c", 30),
        4: ("new-d", 40),   # inserted
    }
    with pytest.raises(ValueError):
        merge_upsert(target, source.drop("n"), keys=["id"])


def test_scd2_apply(spark):
    dim = spark.createDataFrame(
        [
            ("c1", "addr-1", "2023-01-01", "2023-06-01", False),
            ("c1", "addr-2", "2023-06-01", None, True),
            ("c2", "addr-x", "2023-01-01", None, True),
        ],
        ["cust", "addr", "valid_from", "valid_to", "is_current"],
    )
    changes = spark.createDataFrame(
        [
            ("c1", "addr-3", "2024-01-01"),
            ("c1", "addr-4", "2024-02-01"),  # two changes in one batch
            ("c3", "addr-new", "2024-01-15"),  # brand-new key
        ],
        ["cust", "addr", "change_ts"],
    )
    out = scd2_apply(dim, changes, keys=["cust"], change_ts_col="change_ts")
    rows = sorted(
        (r.cust, r.addr, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    )
    assert rows == sorted(
        [
            ("c1", "addr-1", "2023-01-01", "2023-06-01", False),
            ("c1", "addr-2", "2023-06-01", "2024-01-01", False),  # closed
            ("c1", "addr-3", "2024-01-01", "2024-02-01", False),  # intermediate
            ("c1", "addr-4", "2024-02-01", None, True),           # open
            ("c2", "addr-x", "2023-01-01", None, True),           # untouched
            ("c3", "addr-new", "2024-01-15", None, True),         # new key
        ]
    )
    # exactly one current row per key
    cur = out.where("is_current").groupBy("cust").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_streaming_checkpoint_resume(spark, tmp_path):
    """Restarting a streaming query with the SAME checkpoint processes only
    new files — the incremental-processing contract (§2.10)."""
    import os

    from telemetry_parquet_spark.sources.writers import read_dataset
    from telemetry_parquet_spark.streaming.sinks import partitioned_foreach_batch_sink

    src = str(tmp_path / "src")
    os.makedirs(src)
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")

    def add_file(name, rows):
        spark.createDataFrame(rows, ["id", "t", "value"]).select(
            "id", F.col("t").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.parquet(f"{src}/{name}")

    def run():
        schema = "id bigint, ts timestamp, value double"
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(src)
        )
        q = partitioned_foreach_batch_sink(stream, out, checkpoint=cp)
        q.awaitTermination()

    add_file("f1", [(1, "2024-01-01 10:00:00", 1.0)])
    run()
    assert read_dataset(spark, out).count() == 1

    # second run with the same checkpoint: f1 must NOT be reprocessed into
    # duplicates; only f2 lands (different day partition, so a re-write of
    # day 1 would be visible as a change)
    add_file("f2", [(2, "2024-01-02 10:00:00", 2.0)])
    run()
    got = sorted((r.id, r.submission_date_s3) for r in read_dataset(spark, out).collect())
    assert got == [(1, "20240101"), (2, "20240102")]


def test_streaming_same_day_across_batches_keeps_all_rows(spark, tmp_path):
    """The data-loss regression: two micro-batches landing rows for the
    SAME day must both survive — a day-keyed overwrite would have
    replaced batch 1's rows with batch 2's."""
    import os

    from telemetry_parquet_spark.sources.writers import read_dataset
    from telemetry_parquet_spark.streaming.sinks import (
        partitioned_foreach_batch_sink,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")

    def add_file(name, rows):
        spark.createDataFrame(rows, ["id", "t", "value"]).select(
            "id", F.col("t").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.parquet(f"{src}/{name}")

    def run():
        stream = (
            spark.readStream.schema("id bigint, ts timestamp, value double")
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(src)
        )
        q = partitioned_foreach_batch_sink(stream, out, checkpoint=cp)
        q.awaitTermination()

    add_file("f1", [(1, "2024-01-01 10:00:00", 1.0)])
    run()
    add_file("f2", [(2, "2024-01-01 11:00:00", 2.0)])  # SAME day
    run()
    got = sorted(
        (r.id, r.submission_date_s3)
        for r in read_dataset(spark, out).collect()
    )
    assert got == [(1, "20240101"), (2, "20240101")]
