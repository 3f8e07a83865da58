"""Integration test of the reference's §3.3 lifecycle: the
PioneerOnlineNewsDedupe multi-day incremental pipeline — explode day →
anti-join prior state (self-referential dataset) → earliest-wins → write one
day — rebuilt from this engine's operators, plus the streaming foreachBatch
sink's idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from telemetry_parquet_spark.operators.dedup import incremental_dedup
from telemetry_parquet_spark.sources.writers import read_dataset, write_partitioned


def _entries(spark, rows):
    """(pioneer_id, entry_ts, branch, ping_ts, day) entry rows."""
    return spark.createDataFrame(
        rows, "pioneer_id string, entry_ts long, branch string, ping_ts long, submission_date_s3 string"
    )


def test_multi_day_incremental_dedup(spark, tmp_path):
    out = str(tmp_path / "deduped")

    days = {
        "20240101": [
            ("p1", 100, "b", 1000, "20240101"),
            ("p1", 100, "b", 900, "20240101"),   # same key, earlier ping wins
            ("p2", 200, "b", 1000, "20240101"),
        ],
        "20240102": [
            ("p1", 100, "b", 500, "20240102"),   # dup of day-1 key -> dropped
            ("p3", 300, "b", 1000, "20240102"),
        ],
        "20240103": [
            ("p3", 300, "b", 100, "20240103"),   # dup of day-2 key -> dropped
            ("p4", 400, "b", 1000, "20240103"),
        ],
    }
    keys = ["pioneer_id", "entry_ts", "branch"]

    for day in sorted(days):
        new = _entries(spark, days[day])
        try:
            prior = read_dataset(spark, out)
            prior = prior.where(F.col("submission_date_s3") < day)
        except Exception:
            prior = None
        deduped = incremental_dedup(
            new, prior, dedup_keys=keys, earliest_cols=["ping_ts"]
        )
        write_partitioned(deduped, out, ["submission_date_s3"])

    final = read_dataset(spark, out)
    got = {(r.pioneer_id, r.entry_ts): (r.ping_ts, r.submission_date_s3)
           for r in final.collect()}
    assert got == {
        ("p1", 100): (900, "20240101"),   # earliest ping of day 1, dups dropped
        ("p2", 200): (1000, "20240101"),
        ("p3", 300): (1000, "20240102"),  # day-3 copy dropped
        ("p4", 400): (1000, "20240103"),
    }

    # reprocessing safety: re-running day 2 changes nothing
    new = _entries(spark, days["20240102"])
    prior = read_dataset(spark, out).where(F.col("submission_date_s3") < "20240102")
    deduped = incremental_dedup(new, prior, dedup_keys=keys, earliest_cols=["ping_ts"])
    write_partitioned(deduped, out, ["submission_date_s3"])
    assert read_dataset(spark, out).count() == 4


def test_streaming_foreach_batch_sink_idempotent(spark, tmp_path):
    import os

    from telemetry_parquet_spark.streaming.sinks import partitioned_foreach_batch_sink

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-02 11:00:00", 2.0)],
        ["id", "t", "value"],
    ).select("id", F.col("t").cast("timestamp").alias("ts"), "value").coalesce(
        1
    ).write.parquet(src + "/f1")

    out = str(tmp_path / "sink")
    schema = spark.read.parquet(src + "/f1").schema

    def run(checkpoint):
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(src)
        )
        q = partitioned_foreach_batch_sink(stream, out, checkpoint=checkpoint)
        q.awaitTermination()

    run(str(tmp_path / "cp1"))
    first = sorted(map(tuple, read_dataset(spark, out).collect()))
    # replay with a FRESH checkpoint (worst case: full reprocessing) — the
    # dynamic partition overwrite makes it idempotent, not duplicating
    run(str(tmp_path / "cp2"))
    second = sorted(map(tuple, read_dataset(spark, out).collect()))
    assert first == second
    assert len(first) == 2
    assert os.path.isdir(os.path.join(out, "submission_date_s3=20240101"))
