"""Shim source/sink tests (S5/S6/S9/S11/S13, P3) + SQL UDF registration."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.sources.shim import (
    conjunctive_filter,
    decode_gzip_payloads,
    load_exported,
    paged_http_source,
    read_text_artifact,
    write_json,
    write_text_artifact,
)


def test_gzip_decode_source(spark):
    docs = [
        {"id": 1, "payload": {"uid": "u1"}},
        {"id": 2, "payload": {"uid": "u2"}},
    ]
    rows = [(json.dumps(d).encode(),) for d in docs]
    rows = [(gzip.compress(b),) for (b,) in rows]
    rows.append((b"not gzip",))
    rows.append((None,))
    df = spark.createDataFrame(rows, "payload binary")
    out = decode_gzip_payloads(
        df, meta={"submission_date": F.lit("20240101")}
    )
    got = out.select(
        F.try_variant_get("v", "$.id", "int").alias("id"),
        F.col("meta.submission_date").alias("sd"),
    ).collect()
    ids = sorted([r.id for r in got if r.id is not None])
    assert ids == [1, 2]
    assert all(r.sd == "20240101" for r in got)
    # malformed + null payloads yield null variants, not errors
    assert sum(1 for r in got if r.id is None) == 2


def test_conjunctive_filter(spark, sf_dir):
    from telemetry_parquet_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = conjunctive_filter(ev, {"event_type": "click", "user_id": 1})
    rows = out.collect()
    assert all(r.event_type == "click" and r.user_id == 1 for r in rows)
    assert conjunctive_filter(ev, {}).count() == ev.count()


def test_json_sink_and_generic_load(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    p = str(tmp_path / "out_json")
    write_json(df, p)
    back = load_exported(spark, p, fmt="json")
    assert {(r.id, r.s) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_text_artifact_roundtrip(tmp_path):
    body = json.dumps({"model": [1, 2, 3]})
    for codec in (None, "bz2", "gzip"):
        p = write_text_artifact(str(tmp_path / f"art_{codec}"), body, codec)
        assert read_text_artifact(p) == body


def test_paged_http_source_with_cache(spark, tmp_path):
    pages = {
        None: ([{"guid": "a", "rating": 4.0}], "p2"),
        "p2": ([{"guid": "b", "rating": 3.5}], None),
    }
    calls = []

    def fetch(cursor):
        calls.append(cursor)
        return pages[cursor]

    cache = str(tmp_path / "amo_cache.json")
    df = paged_http_source(spark, fetch, cache_path=cache)
    assert {r.guid for r in df.collect()} == {"a", "b"}
    assert calls == [None, "p2"]

    # offline: fetcher raises -> cache serves
    def broken(cursor):
        raise ConnectionError("offline")

    df2 = paged_http_source(spark, broken, cache_path=cache)
    assert {r.guid for r in df2.collect()} == {"a", "b"}


def test_sql_udf_registration(spark):
    import zlib

    from telemetry_parquet_spark.functions.registry import register_udfs

    register_udfs(spark)
    row = spark.sql(
        """SELECT block_id('client-a', 100) AS b,
                  bucketed(7.3, array(1, 5, 10)) AS bk,
                  normalize_iso_timestamp('2018-09-01T08:00:00.0+15:00') AS ts
        """
    ).first()
    assert row.b == zlib.crc32(b"client-a") % 100
    assert row.bk == 10
    assert "+03:00" in row.ts
