"""Streaming sinks — reprocessing-safe writes (SURVEY §2.10: the
reference's "overwrite exactly one day" discipline becomes an idempotent
``foreachBatch`` sink in streaming).

``partitioned_foreach_batch_sink`` writes each micro-batch into a
date-partitioned dataset with dynamic partition overwrite keyed by the
batch's own partition values: replaying a batch rewrites exactly the same
partitions (idempotent), and concurrent days never touch each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def partitioned_foreach_batch_sink(
    stream: DataFrame,
    path: str,
    date_col: str = "submission_date_s3",
    ts_col: str = "ts",
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming write: each micro-batch derives its day key(s) from
    ``ts_col`` and dynamic-overwrites only those partitions."""
    from telemetry_parquet_spark.sources.writers import write_partitioned

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        out = batch.withColumn(date_col, F.date_format(ts_col, "yyyyMMdd"))
        write_partitioned(out, path, [date_col], files_per_partition=1)

    writer = stream.writeStream.foreachBatch(write_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
