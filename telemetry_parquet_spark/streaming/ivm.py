"""Streaming incremental materialized-view maintenance: the CDC stream
source feeding ``refresh_view_incremental``, with the refreshed view
itself stored as a versioned snapshot table.

``maintain_view_stream`` closes the round-9 table-service loop: a base
snapshot table's commits stream out through the ``snapshot_changes``
DataSource (streaming/cdc_source.py), each micro-batch's insert/delete
multiset updates the grouped SUM/COUNT view via
``refresh_view_incremental`` (cost ∝ change volume, never the table),
and the new view state commits ATOMICALLY as one ``overwrite`` version
of the view table. The view is therefore itself time-travelable — every
refresh is a version — and downstream consumers can in turn stream the
VIEW's changes, chaining materializations.

Exactly-once across restarts by the same batch-id idempotence recipe as
``pipelines.py::stream_commit_snapshots``: the (stream, batch_id) stamp
rides in the overwrite manifest atomically, and a replayed batch (crash
after the view commit but before the checkpoint advanced) is recognized
and skipped. A crash before the commit leaves only uncommitted data
files, invisible to readers.

Scale: the view state is group-cardinality-sized, the per-batch delta is
change-volume-sized, and the join between them is group-keyed — nothing
in the loop is ever proportional to the base table. Exactness: the
caller pre-casts the summed column to DECIMAL/int so partial sums are
associative; increments then compose bit-equal to direct re-aggregation
(the batch IVM contract the driver gates via
``snapshot_incremental_view``; the streaming loop is gated by
``tests/test_streaming_ivm.py`` equality against direct aggregation over
two drains and a replay).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources import snapshots as S
from telemetry_parquet_spark.streaming import cdc_source


def read_view(spark: SparkSession, view_root: str) -> DataFrame:
    """The maintained view's current state (head version)."""
    return S.read_snapshot(spark, view_root)


def maintain_view_stream(
    spark: SparkSession,
    table_root: str,
    view_root: str,
    group_cols: list[str],
    sum_col: str,
    checkpoint: str,
    cast_to: str = "decimal(15,2)",
    starting_version: int = 0,
) -> None:
    """Drain the base table's commit log (``availableNow``) into the
    grouped SUM/COUNT view at ``view_root``. Synchronous: each call
    advances the view to the base table's current head. See module
    docstring for the exactly-once and scale contracts."""
    cdc_source.register(spark)
    ckpt_tag = os.path.abspath(checkpoint)
    dec = F.col(sum_col).cast(cast_to)

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        from telemetry_parquet_spark.streaming.pipelines import (
            batch_stamped,
        )

        if batch_stamped(view_root, ckpt_tag, batch_id):
            return  # replayed batch: already committed
        changes = batch_df.withColumn("__p", dec)
        try:
            state = S.read_snapshot(spark, view_root)
        except FileNotFoundError:
            # empty state with exactly the agg's result types
            state = (
                changes.limit(0)
                .groupBy(*group_cols)
                .agg(
                    F.count("*").alias("n_rows"),
                    F.sum("__p").alias("sum_val"),
                )
            )
        new_state = S.refresh_view_incremental(
            state, changes, group_cols, "__p"
        )
        S.overwrite(
            spark, view_root, new_state,
            extra={"batch_id": batch_id, "stream": ckpt_tag},
        )

    q = (
        spark.readStream.format(cdc_source.FORMAT_NAME)
        .option("root", table_root)
        .option("startingVersion", starting_version)
        .load()
        .writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
