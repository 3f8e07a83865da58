"""Scalar function library tests — oracles from the reference's own test
tables (UtilsTest.scala, AddonRecommenderTest.scala) re-expressed."""

from __future__ import annotations

import datetime as dt
import zlib

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.functions import (
    block_id,
    bucketed,
    camelize,
    get_domain,
    normalize_epoch_days,
    normalize_iso_timestamp,
    normalize_yyyymmdd,
    snakify,
    uncamelize,
    yyyymmdd_day_key,
)
from telemetry_parquet_spark.functions.dates import _normalize_iso_offset


class TestNormalizeISO:
    # wrap table from reference UtilsTest.scala:47-62
    @pytest.mark.parametrize(
        "ts,expected_offset_min",
        [
            ("2018-09-01T08:00:00.0-08:00", -8 * 60),
            ("2018-09-01T08:00:00.0-00:00", 0),
            ("2018-09-01T08:00:00.0-12:00", -12 * 60),
            ("2018-09-01T08:00:00.0-13:00", -1 * 60),
            ("2018-09-01T08:00:00.0+14:00", 14 * 60),
            ("2018-09-01T08:00:00.0+15:00", 3 * 60),
        ],
    )
    def test_offset_wrapped_instant_preserved(self, ts, expected_offset_min):
        out = _normalize_iso_offset(ts)
        parsed_in = dt.datetime.fromisoformat(ts)
        parsed_out = dt.datetime.fromisoformat(out)
        assert parsed_out.utcoffset() == dt.timedelta(minutes=expected_offset_min)
        assert parsed_in == parsed_out  # same instant

    def test_in_range_untouched(self):
        assert _normalize_iso_offset("2018-09-01T08:00:00.0+08:00") == (
            "2018-09-01T08:00:00.0+08:00"
        )

    def test_spark_udf(self, spark):
        df = spark.createDataFrame(
            [("2018-09-01T08:00:00.0+15:00",), (None,)], ["ts"]
        ).select(normalize_iso_timestamp("ts").alias("out"))
        rows = [r.out for r in df.collect()]
        assert dt.datetime.fromisoformat(rows[0]).utcoffset() == dt.timedelta(hours=3)
        assert rows[1] is None


def test_normalize_yyyymmdd(spark):
    # oracle from UtilsTest.scala:64-66
    df = spark.createDataFrame([("20180901",)], ["d"]).select(
        normalize_yyyymmdd("d").alias("out")
    )
    assert df.first().out == "2018-09-01T00:00:00Z"


def test_normalize_epoch_days(spark):
    df = spark.createDataFrame([(17775,)], ["d"]).select(
        normalize_epoch_days("d").alias("out")
    )
    # 17775 days after epoch = 2018-09-01
    assert df.first().out == "2018-09-01T00:00:00Z"


def test_yyyymmdd_day_key(spark):
    df = spark.createDataFrame([(1528394400000,)], ["ms"]).select(
        yyyymmdd_day_key("ms").alias("out")
    )
    assert df.first().out == "20180607"


def test_block_id_crc32_compatible(spark):
    """blockIdFromString = crc32 % n (utils/package.scala:156-160); Spark's
    crc32 must agree with zlib's."""
    values = ["client-a", "client-b", "", "0123456789abcdef"]
    df = spark.createDataFrame([(v,) for v in values], ["s"]).select(
        "s", block_id("s", 100).alias("b")
    )
    got = {r.s: r.b for r in df.collect()}
    for v in values:
        assert got[v] == zlib.crc32(v.encode()) % 100


def test_bucketed(spark):
    """First split >= value, else max+1 (udfs.scala:17-19)."""
    df = spark.createDataFrame(
        [(0.5,), (1.0,), (7.3,), (99.0,), (1000.0,)], ["v"]
    ).select("v", bucketed("v", [1, 5, 10, 50, 100]).alias("b"))
    got = {r.v: r.b for r in df.collect()}
    assert got[0.5] == 1
    assert got[1.0] == 1
    assert got[7.3] == 10
    assert got[99.0] == 100
    assert got[1000.0] == 101


def test_get_domain(spark):
    """pioneer/package.scala:18-32 semantics: host, last-2 labels, fallbacks."""
    cases = {
        "https://www.news.example.com/article/1": "example.com",
        "http://example.com/x": "example.com",
        "https://sub.a.co.uk:8080/p?q=1": "co.uk",  # naive last-2 (as reference)
        "example.org/path": "example.org",
        "http://user:pw@host.example.net/x": "example.net",
        "not a url with spaces/path": "not a url with spaces",
        "": None,
    }
    df = spark.createDataFrame([(k,) for k in cases], ["url"]).select(
        "url", get_domain("url").alias("d")
    )
    got = {r.url: r.d for r in df.collect()}
    for url, expected in cases.items():
        assert got[url] == expected, url


def test_name_conversions():
    # UtilsTest.scala:19-29
    assert camelize("foo_bar") == "fooBar"
    assert camelize("foo") == "foo"
    assert uncamelize("fooBar") == "foo_bar"
    assert uncamelize("foo") == "foo"
    assert uncamelize("") == ""
    assert camelize("memory_mb") == "memoryMB"
    assert uncamelize("memoryMB") == "memory_mb"
    # Partitioning.scala:19-20
    assert snakify("submissionDate") == "submission_date"
    assert snakify("DocType") == "doc_type"
