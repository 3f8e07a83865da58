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


import pytest

_STATE_PROVIDERS = ["default", "rocksdb"]


@pytest.mark.parametrize("provider", _STATE_PROVIDERS)
def test_idle_key_evicted_after_timeout(spark, tmp_path, provider):
    """Keys idle for > idle_timeout_ms must be dropped from the state store
    (ProcessingTimeTimeout): when they reappear, their running counts
    restart from zero. Without the timeout, the companion test above proves
    the same keys DO accumulate across batches — together they pin the
    eviction behavior, not just state loss.

    Runs under BOTH state-store providers: the heap-backed default and
    RocksDB (the 100x-key-cardinality configuration, session.py) — the
    provider is an execution detail that must not change eviction
    semantics. The provider conf is read at query start, so setting it
    before start() scopes it to this query.

    One continuous query with a manual stop: an availableNow trigger cannot
    be used with processing-time timers — the engine keeps scheduling empty
    batches for the timer clock and never reaches termination. The engine
    runs those timer batches while idle, so any key past its deadline is
    evicted before the next file arrives."""
    import os
    import time

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    if provider == "rocksdb":
        from telemetry_parquet_spark.session import ROCKSDB_STATE_PROVIDER

        spark.conf.set(conf_key, ROCKSDB_STATE_PROVIDER)

    d = str(tmp_path / "src")
    os.makedirs(d)

    def write_batch(name, rows):
        spark.createDataFrame(rows, ["user_id", "t", "value"]).select(
            "user_id", F.col("t").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.parquet(f"{d}/{name}")

    # batch 1 exists before the stream starts: both keys enter state
    write_batch("b1", [(1, "2024-01-01 00:00:00", 10.0), (2, "2024-01-01 00:00:30", 5.0)])

    got = []

    def sink(bdf, _bid):
        got.extend(bdf.collect())

    schema = spark.read.parquet(f"{d}/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(d)
    )
    q = (
        running_user_stats(stream, idle_timeout_ms=1000)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()
    )

    def wait_rows(n, timeout=120.0):
        t0 = time.time()
        while len(got) < n:
            assert time.time() - t0 < timeout, f"only {len(got)}/{n} rows: {got}"
            time.sleep(0.2)

    try:
        wait_rows(2)  # batch 1 processed: rows for users 1 and 2
        # idle both keys past the timeout; the engine's timer batches run
        # while no files arrive and evict both states
        time.sleep(3.0)
        write_batch("b2", [(1, "2024-01-01 00:01:00", 2.5), (2, "2024-01-01 00:01:01", 7.0)])
        wait_rows(4)
    finally:
        q.stop()
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)

    latest = {r.user_id: (r.n_events, r.total_value) for r in got}
    # fresh state after idling: counts restart at 1, totals at the new value
    # (without eviction these would be (2, 12.5) / (2, 12.0) — exactly what
    # test_state_accumulates_across_batches asserts for the no-timeout path)
    assert latest[1] == (1, 2.5), "idle key 1 was not evicted"
    assert latest[2] == (1, 7.0), "idle key 2 was not evicted"


def test_mg_state_accumulates_and_stays_bounded(spark, tmp_path):
    """Streaming Misra-Gries: counters must accumulate across micro-batches
    (exact when distinct ≤ k), and in the LOSSY regime (k < distinct) the
    state may never exceed k counters while every emitted count stays a
    valid lower bound with count_lb + err_ub ≥ true frequency."""
    import os

    from telemetry_parquet_spark.streaming.stateful import streaming_heavy_hitters

    d = str(tmp_path / "mg_src")
    os.makedirs(d)

    def write_batch(name, rows):
        spark.createDataFrame(rows, ["event_type", "user_id"]).coalesce(
            1
        ).write.parquet(f"{d}/{name}")

    # true counts for type "a": u1=5, u2=3, u3=1, u4=1 (across two batches)
    write_batch("b1", [("a", 1)] * 3 + [("a", 2)] * 2 + [("a", 3)])
    write_batch("b2", [("a", 1)] * 2 + [("a", 2)] + [("a", 4)])
    schema = spark.read.parquet(f"{d}/b1").schema

    def run(k, name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(d)
        )
        out = streaming_heavy_hitters(stream, k=k, emit_top=10)
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name).collect()

    # exact regime: k=8 > 4 distinct users -> final emission == exact counts
    rows = run(8, "mg_exact")
    final = {}
    for r in rows:  # update mode: later rows supersede; keep max count_lb
        final[r.user_id] = max(final.get(r.user_id, 0), r.count_lb)
    assert final == {1: 5, 2: 3, 3: 1, 4: 1}
    assert all(r.err_ub == 0 for r in rows)

    # lossy regime (single batch so the emission is the final state):
    # k=2 -> at most 2 counters survive, and every emitted count is a
    # valid lower bound whose err_ub covers the true frequency
    d2 = str(tmp_path / "mg_lossy_src")
    os.makedirs(d2)
    spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 2)] * 3 + [("a", 3)] + [("a", 4)],
        ["event_type", "user_id"],
    ).coalesce(1).write.parquet(f"{d2}/b1")
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(d2, recursiveFileLookup="true")
    )
    out = streaming_heavy_hitters(stream, k=2, emit_top=10)
    q = (
        out.writeStream.format("memory")
        .queryName("mg_lossy")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("mg_lossy").collect()
    true = {1: 5, 2: 3, 3: 1, 4: 1}
    assert 0 < len(rows) <= 2  # state never exceeds k counters
    for r in rows:
        assert r.count_lb <= true[r.user_id] <= r.count_lb + r.err_ub
