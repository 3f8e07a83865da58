"""Exported-ping shim sources/sinks — the rest of the SURVEY §2.1 inventory.

- S5 generic format load (``DatasetShim.scala:40``)
- S6 gzip-payload decode source (``DatasetShim.scala:48-86``): binary
  ``payload`` column → gunzip → UTF-8 → variant parse, with a synthesized
  ``meta`` struct re-attached. gunzip is the library's one Pandas UDF (no
  JVM builtin; Arrow-batched, not row-at-a-time).
- S9 JSON sink (``DatasetComparator.scala:55``)
- S11 text artifact sink/source with compression codec
  (``utils/package.scala:162-213``; used for model artifacts, BZip2)
- S13 paged HTTP/REST source (``AMODatabase.scala:59-106``): driver-side
  cursor loop → DataFrame; network access is gated behind an import-try so
  offline environments get the cache path.
- P3 conjunctive filter fold (``DatasetShim.scala:52-57``).
"""

from __future__ import annotations

import gzip
import json
import os
from collections.abc import Callable
from functools import reduce

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType


def load_exported(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S5: pluggable-format load."""
    return spark.read.format(fmt).load(path)


@F.pandas_udf(BinaryType())
def _gunzip(payloads: pd.Series) -> pd.Series:
    def one(b):
        if b is None:
            return None
        try:
            return gzip.decompress(bytes(b))
        except (OSError, EOFError):
            return None

    return payloads.map(one)


def decode_gzip_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    meta: dict[str, Column] | None = None,
    out_col: str = "v",
) -> DataFrame:
    """S6/F18: gunzip the binary payload, decode UTF-8, parse to variant,
    and attach a synthesized ``meta`` struct (submission date/geo columns in
    the reference, DatasetShim.scala:59-84)."""
    decoded = df.withColumn("__raw", _gunzip(F.col(payload_col)))
    parsed = decoded.withColumn(
        out_col, F.try_parse_json(F.decode(F.col("__raw"), "UTF-8"))
    ).drop("__raw")
    if meta:
        parsed = parsed.withColumn(
            "meta", F.struct(*[c.alias(name) for name, c in meta.items()])
        )
    return parsed


def conjunctive_filter(df: DataFrame, equals: dict[str, object]) -> DataFrame:
    """P3: fold attribute→value equality over a config map
    (DatasetShim.scala:52-57) with Column expressions."""
    if not equals:
        return df
    preds = [F.col(k) == F.lit(v) for k, v in equals.items()]
    return df.where(reduce(Column.__and__, preds))


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S9: JSON sink."""
    df.write.mode(mode).json(path)


def write_text_artifact(path: str, body: str, codec: str | None = None) -> str:
    """S11: small text artifact (model mappings etc.) with optional
    compression — bz2/gzip via Python stdlib, matching the reference's
    Hadoop-codec artifacts. Returns the final path (codec suffix added)."""
    if codec is None:
        with open(path, "w") as f:
            f.write(body)
        return path
    if codec == "bz2":
        import bz2

        final = path if path.endswith(".bz2") else path + ".bz2"
        with bz2.open(final, "wt") as f:
            f.write(body)
        return final
    if codec == "gzip":
        final = path if path.endswith(".gz") else path + ".gz"
        with gzip.open(final, "wt") as f:
            f.write(body)
        return final
    raise ValueError(f"unknown codec {codec!r}")


def read_text_artifact(path: str) -> str:
    """S11 read side (codec inferred from suffix)."""
    if path.endswith(".bz2"):
        import bz2

        with bz2.open(path, "rt") as f:
            return f.read()
    if path.endswith(".gz"):
        with gzip.open(path, "rt") as f:
            return f.read()
    with open(path) as f:
        return f.read()


def paged_http_source(
    spark: SparkSession,
    fetch_page: Callable[[str | None], tuple[list[dict], str | None]],
    cache_path: str | None = None,
    max_pages: int = 1000,
) -> DataFrame:
    """S13: cursor-paged REST source (AMODatabase.scala:59-106 shape).

    ``fetch_page(cursor) -> (records, next_cursor)`` runs on the DRIVER (the
    reference did the same — the result is a small dimension table meant to
    be broadcast); results are cached to ``cache_path`` as JSON, and the
    cache is used when the fetcher raises (offline mode)."""
    records: list[dict] = []
    try:
        cursor: str | None = None
        for _ in range(max_pages):
            page, cursor = fetch_page(cursor)
            records.extend(page)
            if cursor is None:
                break
        if cache_path:
            with open(cache_path, "w") as f:
                json.dump(records, f)
    except Exception:
        if cache_path and os.path.exists(cache_path):
            with open(cache_path) as f:
                records = json.load(f)
        else:
            raise
    return spark.createDataFrame(pd.DataFrame.from_records(records))
