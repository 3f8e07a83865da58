"""UDTF / Pandas-UDAF fallback-path tests (§2.11) — including agreement of
the UDTF event parse with the expression-based variant parser."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_udtf_parse_events_agrees_with_variant_parser(spark):
    from telemetry_parquet_spark.functions.fallbacks import ParseEventsUDTF
    from telemetry_parquet_spark.sources.json_ingest import events_view, parse_pings

    events = [
        [1000, "sync", "displayURI", "send", None, {"k": 1, "n": None, "b": True}],
        [2000, "pip", "create", "player", "sv"],
        ["malformed"],
        [3000, "only-two"],
    ]
    # UDTF path
    spark.udtf.register("parse_events", ParseEventsUDTF)
    df = spark.createDataFrame([(json.dumps(events),)], ["ej"])
    df.createOrReplaceTempView("raw_events")
    udtf_rows = spark.sql(
        "SELECT t.* FROM raw_events, LATERAL parse_events(ej) t"
    ).collect()

    # expression path (wrap in a ping document)
    ping = json.dumps({"payload": {"uid": "u", "events": events}})
    expr_rows = events_view(
        parse_pings(spark.createDataFrame([(ping,)], ["json"]))
    ).collect()

    a = sorted(
        (r.ts, r.category, r.method, r.object, r.string_value,
         dict(r.map_values) if r.map_values else None)
        for r in udtf_rows
    )
    b = sorted(
        (r.event_timestamp, r.event_category, r.event_method, r.event_object,
         r.event_string_value,
         dict(r.event_map_values) if r.event_map_values else None)
        for r in expr_rows
    )
    assert a == b and len(a) == 2


def test_weighted_median_grouped_agg(spark):
    from telemetry_parquet_spark.functions.fallbacks import weighted_median

    df = spark.createDataFrame(
        [("g1", 1.0, 1.0), ("g1", 2.0, 1.0), ("g1", 100.0, 10.0),
         ("g2", 5.0, 1.0)],
        ["g", "v", "w"],
    )
    out = {r.g: r.wm for r in df.groupBy("g").agg(
        weighted_median("v", "w").alias("wm")).collect()}
    assert out["g1"] == 100.0  # weight-10 value dominates
    assert out["g2"] == 5.0
