"""Scalar function library (SURVEY.md §2.9)."""

from telemetry_parquet_spark.functions.dates import (
    normalize_epoch_days,
    normalize_iso_timestamp,
    normalize_yyyymmdd,
    yesterday_yyyymmdd,
    yyyymmdd_day_key,
)
from telemetry_parquet_spark.functions.hashing import block_id, bucketed, positive_id_hash
from telemetry_parquet_spark.functions.strings import camelize, get_domain, snakify, uncamelize

__all__ = [
    "normalize_epoch_days",
    "normalize_iso_timestamp",
    "normalize_yyyymmdd",
    "yesterday_yyyymmdd",
    "yyyymmdd_day_key",
    "block_id",
    "bucketed",
    "positive_id_hash",
    "camelize",
    "get_domain",
    "snakify",
    "uncamelize",
]
