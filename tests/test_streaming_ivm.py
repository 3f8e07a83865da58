"""Streaming IVM loop (streaming/ivm.py): CDC stream -> incremental
refresh -> view-as-a-snapshot-table, equal to direct aggregation after
every drain, exactly-once on replay, and versioned per refresh."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from telemetry_parquet_spark.sources.snapshots import (
    append,
    compact_table,
    delete_where,
    history,
    read_snapshot,
)
from telemetry_parquet_spark.streaming.ivm import (
    maintain_view_stream,
    read_view,
)


def _direct(df):
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(15,2)")).alias(
                "sum_val"
            ),
        )
    )


def _multiset(df):
    return sorted(tuple(r) for r in df.select(
        "o_orderstatus", "n_rows", "sum_val"
    ).collect())


def test_streaming_view_matches_direct_agg(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")

    # drain 1: append + delete (+ compaction, which must contribute 0)
    append(spark, base, orders.where(F.col("o_orderkey") % 10 < 7))
    delete_where(spark, base, "o_orderpriority = '1-URGENT'")
    compact_table(spark, base, target_bytes=1 << 30)
    maintain_view_stream(
        spark, base, view, ["o_orderstatus"], "o_totalprice", ckpt
    )
    assert _multiset(read_view(spark, view)) == _multiset(
        _direct(read_snapshot(spark, base))
    )

    # drain 1b: a MERGE-ON-READ delete (deletion vector, no rewrite)
    # must flow through the CDC stream into the view identically
    from telemetry_parquet_spark.sources.snapshots import delete_where_mor

    delete_where_mor(spark, base, "o_orderpriority = '2-HIGH'")
    maintain_view_stream(
        spark, base, view, ["o_orderstatus"], "o_totalprice", ckpt
    )
    assert _multiset(read_view(spark, view)) == _multiset(
        _direct(read_snapshot(spark, base))
    )
    compact_table(spark, base, target_bytes=1 << 30)  # materialize DVs

    # drain 2: the checkpoint resumes — only the new commit streams.
    # Keep a pre-drain copy of the checkpoint to simulate a crash that
    # loses the checkpoint advance AFTER the view commit.
    import shutil

    ckpt_backup = str(tmp_path / "ckpt_backup")
    shutil.copytree(ckpt, ckpt_backup)
    append(spark, base, orders.where(F.col("o_orderkey") % 10 >= 7))
    maintain_view_stream(
        spark, base, view, ["o_orderstatus"], "o_totalprice", ckpt
    )
    assert _multiset(read_view(spark, view)) == _multiset(
        _direct(read_snapshot(spark, base))
    )

    # every refresh was one atomic overwrite version of the view table
    acts = [h["action"] for h in history(view)]
    assert acts[0] == "create" and set(acts[1:]) == {"overwrite"}
    n_versions = len(acts)

    # drain 3: nothing new — no spurious version, state unchanged
    before = _multiset(read_view(spark, view))
    maintain_view_stream(
        spark, base, view, ["o_orderstatus"], "o_totalprice", ckpt
    )
    assert _multiset(read_view(spark, view)) == before
    assert len(history(view)) == n_versions

    # crash replay: restore the pre-drain-2 checkpoint (commit landed,
    # checkpoint advance lost) — the re-delivered batch carries the same
    # batch id, the manifest stamp recognizes it, and the view neither
    # changes nor gains a version (exactly-once).
    shutil.rmtree(ckpt)
    shutil.copytree(ckpt_backup, ckpt)
    maintain_view_stream(
        spark, base, view, ["o_orderstatus"], "o_totalprice", ckpt
    )
    assert _multiset(read_view(spark, view)) == before
    assert len(history(view)) == n_versions

    # and a fresh stream over the full log CONVERGES: increments from
    # version 0 re-compose to the same state on a brand-new view
    ckpt2 = str(tmp_path / "ckpt2")
    view2 = str(tmp_path / "view2")
    maintain_view_stream(
        spark, base, view2, ["o_orderstatus"], "o_totalprice", ckpt2
    )
    assert _multiset(read_view(spark, view2)) == before
