"""Regression guard for the two ``events.ts`` physical layouts.

The driver's testdata generator has shipped the events table with ``ts`` as
parquet TIMESTAMP(NANOS) (rounds 1-3; Spark's vectorized reader rejects it,
so we read nanos-as-long and floor to micros) and as plain TIMESTAMP(MICROS)
(round 4+; reads natively as TIMESTAMP_NTZ). ``load_table`` and the streaming
ingest adapt to whichever is present — this test pins both paths with tiny
synthetic files so a future layout flip can never again take down every
events-based query (see CORRECTNESS_r04: 11 DATATYPE_MISMATCH failures).
"""

from __future__ import annotations

import datetime
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 7, 179575), 10, "click", 1.5, "{}"),
    (2, datetime.datetime(2024, 1, 2, 12, 30, 0, 1), 11, "view", 2.5, "{}"),
]


def _write_events(tmpdir: str, unit: str) -> str:
    """Write a 2-row events.parquet with ts at the given timestamp unit."""
    sf_dir = os.path.join(tmpdir, f"layout_{unit}")
    os.makedirs(sf_dir, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_table_adapts_to_ts_layout(spark, tmp_path, unit):
    from telemetry_parquet_spark.sources.tables import load_table

    sf_dir = _write_events(str(tmp_path), unit)
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    got = sorted((r.event_id, r.ts) for r in df.select("event_id", "ts").collect())
    # both layouts land on the same wall-clock microsecond values
    assert got == [(r[0], r[1]) for r in ROWS]


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_streaming_ingest_adapts_to_ts_layout(spark, tmp_path, unit):
    """The raw-stream conversion in queries/streaming.py handles both
    layouts (it sees the pre-normalization schema, unlike load_table)."""
    from telemetry_parquet_spark.queries.streaming import _events_stream_build
    from telemetry_parquet_spark.streaming.pipelines import run_available_now

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf_dir = _write_events(str(tmp_path), unit)
    out = run_available_now(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        _events_stream_build(lambda df: df.select("event_id", "ts")),
        output_mode="append",
    )
    got = sorted((r.event_id, r.ts) for r in out.collect())
    assert got == [(r[0], r[1]) for r in ROWS]


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_stream_stream_join_schema_fetch_adapts(spark, tmp_path, unit):
    """stream_stream_view_purchase does a BATCH schema fetch before _run
    sets the legacy nanos conf; when it is the first events reader in a
    fresh session on the ns layout, that read must not raise
    (the round-5 ADVICE item). Unset the conf to simulate a fresh session."""
    from telemetry_parquet_spark.queries.streaming import stream_stream_view_purchase

    sf_dir = os.path.join(str(tmp_path), f"join_{unit}")
    os.makedirs(sf_dir, exist_ok=True)
    rows = [
        (1, datetime.datetime(2024, 1, 1, 10, 0, 0), 10, "view", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 10, 30, 0), 10, "purchase", 2.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 12, 0, 0), 10, "purchase", 3.0, "{}"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    try:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass
    out = stream_stream_view_purchase(spark, sf_dir)
    got = sorted((r.view_id, r.purchase_id) for r in out.collect())
    # only the purchase within 1h of the view joins
    assert got == [(1, 2)]
