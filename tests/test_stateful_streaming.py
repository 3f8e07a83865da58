"""applyInPandasWithState: per-key state must accumulate ACROSS micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from telemetry_parquet_spark.streaming.stateful import running_user_stats


def test_state_accumulates_across_batches(spark, tmp_path):
    import os

    d = str(tmp_path / "src")
    os.makedirs(d)

    def write_batch(name, rows):
        spark.createDataFrame(rows, ["user_id", "t", "value"]).select(
            "user_id", F.col("t").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.parquet(f"{d}/{name}")

    write_batch("b1", [(1, "2024-01-01 00:00:00", 10.0), (2, "2024-01-01 00:00:30", 5.0)])
    write_batch("b2", [(1, "2024-01-01 00:01:00", 2.5)])

    schema = spark.read.parquet(f"{d}/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(d)
    )
    out = running_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("user_stats").collect()
    # user 1 appears in both batches: its LAST update row must show the
    # accumulated state (3 events only if batches merged... 2 events here)
    latest = {}
    for r in rows:
        latest[r.user_id] = max(
            latest.get(r.user_id, (0,)), (r.n_events, r.total_value)
        )
    assert latest[1] == (2, 12.5)  # state carried across micro-batches
    assert latest[2] == (1, 5.0)
