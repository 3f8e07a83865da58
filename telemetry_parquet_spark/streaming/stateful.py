"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 — net-new surface; the reference had no streaming at all).

``running_user_stats`` keeps per-key state across micro-batches: event count,
value sum, and last-seen timestamp, emitting one updated row per key per
batch. This is the building block the reference's accumulator-style job
metrics (A10) would become in a continuous pipeline.

State design for scale: state lives in the state store keyed by the group
key — bounded by key cardinality, not stream length; a ProcessingTimeTimeout
evicts idle keys (``idle_timeout_ms``).
"""

from __future__ import annotations

import functools
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
)
STATE_SCHEMA = "n bigint, total double, last_ts timestamp"


def _update_user_stats(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    idle_timeout_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    if idle_timeout_ms:
        # re-arm the idle-eviction clock on every batch that touches the key;
        # a key with no arrivals for idle_timeout_ms gets the hasTimedOut
        # branch above and is removed from the state store
        state.setTimeoutDuration(idle_timeout_ms)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last_ts],
        }
    )


def running_user_stats(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running (count, sum, last_ts) maintained in streaming state;
    emits the updated row for every key seen in each micro-batch."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    update_fn = functools.partial(_update_user_stats, idle_timeout_ms=idle_timeout_ms)
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        update_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


MG_OUTPUT_SCHEMA = (
    "event_type string, user_id bigint, count_lb bigint, err_ub bigint"
)
MG_STATE_SCHEMA = "terms array<bigint>, cnts array<bigint>, dec bigint"


def _update_heavy_hitters(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    k: int,
    emit_top: int,
    idle_timeout_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    from telemetry_parquet_spark.datapipe.heavy_hitters import _mg_compress

    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        terms, cnts, dec = state.get
        counts = dict(zip(terms, cnts))
    else:
        counts, dec = {}, 0
    for pdf in batches:
        for t, c in pdf["user_id"].value_counts().items():
            counts[int(t)] = counts.get(int(t), 0) + int(c)
        counts, d = _mg_compress(counts, k)
        dec += d
    state.update((list(counts), [int(c) for c in counts.values()], dec))
    if idle_timeout_ms:
        # same idle-eviction contract as running_user_stats: a key with
        # no arrivals for idle_timeout_ms hits the hasTimedOut branch and
        # releases its k counters from the state store
        state.setTimeoutDuration(idle_timeout_ms)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:emit_top]
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(top),
            "user_id": [t for t, _ in top],
            "count_lb": [c for _, c in top],
            "err_ub": [dec] * len(top),
        }
    )


def streaming_heavy_hitters(
    events: DataFrame,
    k: int = 2048,
    emit_top: int = 16,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Misra-Gries heavy hitters as STREAMING STATE: per event_type, the
    state store holds at most ``k`` (user, count) counters plus one
    decrement tally — bounded by k forever, regardless of stream length
    (the unbounded alternative, a streaming groupBy(user) count, keys state
    by USER cardinality). Each micro-batch folds its arrivals into the
    counters with the same ``_mg_compress`` the batch sketch uses, so the
    MG bounds hold across batches: emitted ``count_lb ≤ true ≤ count_lb +
    err_ub`` with ``err_ub`` the accumulated decrement. In the exact
    regime (distinct users ≤ k) no decrement ever fires and the emitted
    top rows ARE the exact per-type user counts — the driver's oracle
    gate."""
    update_fn = functools.partial(
        _update_heavy_hitters, k=k, emit_top=emit_top,
        idle_timeout_ms=idle_timeout_ms,
    )
    return (
        events.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            update_fn,
            outputStructType=MG_OUTPUT_SCHEMA,
            stateStructType=MG_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
