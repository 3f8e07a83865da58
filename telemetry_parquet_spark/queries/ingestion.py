"""Ingestion round-trip query: the VARIANT ping pipeline (sources/
json_ingest.py) under the DuckDB correctness gate.

Ping documents are synthesized in-flight from the events table (one ping per
user; one sync per event), pushed through the REAL ingestion path
(parse_pings → nested_sync_view with required-field rejection), and the
flattened output is compared against an oracle computed relationally from
the same events rows — so X3 explode, typed variant extraction, and the
defaulting rules are all value-checked, not just pytest-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table


@query(
    "ping_ingestion_roundtrip",
    oracle="""
    SELECT
      CAST(user_id AS VARCHAR) AS uid,
      epoch_ms(ts) AS "when",
      CAST(floor(value) AS BIGINT) AS took,
      event_type AS why
    FROM events
    """,
)
def ping_ingestion_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build one ping JSON per user (syncs = that user's events), ingest via
    the variant pipeline, emit (uid, when, took, why) per sync row."""
    from telemetry_parquet_spark.sources.json_ingest import (
        nested_sync_view,
        parse_pings,
    )

    events = load_table(spark, sf_dir, "events")
    sync = F.struct(
        F.unix_millis(F.col("ts").cast("timestamp")).alias("when"),
        F.floor("value").cast("long").alias("took"),
        F.col("event_type").alias("why"),
    )
    pings = (
        events.groupBy("user_id")
        .agg(F.collect_list(sync).alias("syncs"))
        .select(
            F.to_json(
                F.struct(
                    F.struct(
                        F.col("user_id").cast("string").alias("uid"),
                        F.col("syncs"),
                    ).alias("payload")
                )
            ).alias("json")
        )
    )
    nested = nested_sync_view(parse_pings(pings))
    return nested.select("uid", "when", "took", "why")


@query(
    "ping_events_roundtrip",
    oracle="""
    SELECT
      CAST(user_id AS VARCHAR) AS uid,
      epoch_ms(ts) AS event_timestamp,
      event_type AS event_category,
      CAST(event_id AS VARCHAR) AS flow
    FROM events
    """,
)
def ping_events_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 positional heterogeneous event arrays under the gate: build raw
    JSON pings whose payload.events are ``[ts, category, method, object,
    null, {mapValues}]`` positional arrays (plus one malformed entry per
    ping, which the parser must silently skip — Events.scala:32-80
    semantics), run the real events_view, emit per-event rows."""
    from telemetry_parquet_spark.sources.json_ingest import events_view, parse_pings

    events = load_table(spark, sf_dir, "events")
    ev_json = F.format_string(
        '[%s,"%s","method","object",null,{"flow":"%s"}]',
        F.unix_millis(F.col("ts").cast("timestamp")).cast("string"),
        F.col("event_type"),
        F.col("event_id").cast("string"),
    )
    pings = (
        events.groupBy("user_id")
        .agg(F.collect_list(ev_json).alias("__evs"))
        .select(
            F.concat(
                F.lit('{"payload":{"uid":"'),
                F.col("user_id").cast("string"),
                F.lit('","events":['),
                F.concat_ws(",", F.col("__evs")),
                F.lit(',["malformed"]]}}'),
            ).alias("json")
        )
    )
    out = events_view(parse_pings(pings))
    return out.select(
        "uid",
        "event_timestamp",
        "event_category",
        F.element_at("event_map_values", "flow").alias("flow"),
    )


@query(
    "ping_flat_sync_roundtrip",
    oracle="""
    WITH base AS (
      SELECT CAST(user_id AS VARCHAR) AS uid,
             epoch_ms(ts) AS sync_when,
             strftime(ts, '%Y%m%d') AS sync_day,
             event_type, event_id, value
      FROM events
    )
    SELECT uid, sync_when, sync_day,
           event_type AS engine_name,
           CAST(floor(value) AS BIGINT) AS engine_took,
           CAST(NULL AS VARCHAR) AS engine_status,
           CAST(event_id % 5 AS BIGINT) AS engine_incoming_applied,
           CAST(2 AS INTEGER) AS engine_outgoing_batch_count,
           CAST(event_id % 3 + 2 AS BIGINT) AS engine_outgoing_total_sent,
           CAST(1 AS BIGINT) AS engine_outgoing_total_failed
    FROM base
    UNION ALL
    SELECT uid, sync_when, sync_day,
           'bookmarks' AS engine_name,
           CAST(0 AS BIGINT) AS engine_took,
           'ok' AS engine_status,
           CAST(0 AS BIGINT) AS engine_incoming_applied,
           CAST(0 AS INTEGER) AS engine_outgoing_batch_count,
           CAST(0 AS BIGINT) AS engine_outgoing_total_sent,
           CAST(0 AS BIGINT) AS engine_outgoing_total_failed
    FROM base
    """,
)
def ping_flat_sync_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 sync × engine flatten under the gate (singleEngineFlatSyncType,
    SyncPingConversion.scala:526-640): pings are synthesized with TWO
    engines per sync — one carrying took/incoming/outgoing (the outgoing
    array rolls up via the F13 higher-order aggregate), one sparse engine
    exercising every defaulting rule (absent numerics → 0, absent struct →
    null, absent outgoing → batch_count 0). One flat row per sync × engine;
    the synthesized-when-absent sync_id (F17 uuid) is excluded as
    intentionally non-deterministic."""
    from telemetry_parquet_spark.sources.json_ingest import (
        flat_sync_view,
        nested_sync_view,
        parse_pings,
    )

    events = load_table(spark, sf_dir, "events")
    engine_full = F.struct(
        F.col("event_type").alias("name"),
        F.floor("value").cast("long").alias("took"),
        F.struct((F.col("event_id") % 5).alias("applied")).alias("incoming"),
        F.array(
            F.struct(
                (F.col("event_id") % 3).alias("sent"),
                F.lit(1).cast("long").alias("failed"),
            ),
            F.struct(
                F.lit(2).cast("long").alias("sent"),
                F.lit(None).cast("long").alias("failed"),
            ),
        ).alias("outgoing"),
        F.lit(None).cast("string").alias("status"),
    )
    engine_sparse = F.struct(
        F.lit("bookmarks").alias("name"),
        F.lit(None).cast("long").alias("took"),
        F.lit(None).cast("struct<applied:bigint>").alias("incoming"),
        F.lit(None).cast(
            "array<struct<sent:bigint,failed:bigint>>"
        ).alias("outgoing"),
        F.lit("ok").alias("status"),
    )
    sync = F.struct(
        F.unix_millis(F.col("ts").cast("timestamp")).alias("when"),
        F.array(engine_full, engine_sparse).alias("engines"),
    )
    pings = (
        events.groupBy("user_id")
        .agg(F.collect_list(sync).alias("syncs"))
        .select(
            F.to_json(
                F.struct(
                    F.struct(
                        F.col("user_id").cast("string").alias("uid"),
                        F.col("syncs"),
                    ).alias("payload")
                )
            ).alias("json")
        )
    )
    flat = flat_sync_view(nested_sync_view(parse_pings(pings)))
    return flat.select(
        "uid",
        F.col("when").alias("sync_when"),
        "sync_day",
        "engine_name",
        "engine_took",
        "engine_status",
        "engine_incoming_applied",
        "engine_outgoing_batch_count",
        F.col("engine_outgoing_batch_total_sent").alias("engine_outgoing_total_sent"),
        F.col("engine_outgoing_batch_total_failed").alias(
            "engine_outgoing_total_failed"
        ),
    )
