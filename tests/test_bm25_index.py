"""Materialized BM25 inverted index: serving equivalence with the
scan-time path, incremental per-day appends, and pushdown evidence."""

from __future__ import annotations

from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.retrieval import (
    append_bm25_partition,
    bm25_indexed_top_k,
    bm25_top_k,
    build_bm25_index,
    ensure_bm25_index,
)
from telemetry_parquet_spark.plans.explain import formatted_plan
from telemetry_parquet_spark.sources.tables import load_table

TERMS = ["vector", "window", "stream"]


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_indexed_equals_scan_time(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    prefix = ensure_bm25_index(spark, sf_dir)
    expect = _rows(bm25_top_k(spark, docs, TERMS, k=15))
    got = _rows(bm25_indexed_top_k(spark, prefix, TERMS, k=15))
    assert got == expect


def test_ensure_reuses_until_fingerprint_changes(spark, sf_dir):
    p1 = ensure_bm25_index(spark, sf_dir)
    stats1 = _rows(spark.table(f"{p1}_stats"))
    p2 = ensure_bm25_index(spark, sf_dir)
    assert p1 == p2
    # reuse must not rewrite the stats relation
    assert _rows(spark.table(f"{p2}_stats")) == stats1


def test_incremental_append_equals_full_build(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    day1 = docs.where(F.col("doc_id") % 2 == 0)
    day2 = docs.where(F.col("doc_id") % 2 == 1)
    prefix = "bm25_idx_test_incr"
    build_bm25_index(spark, day1, prefix, batch="day1")
    append_bm25_partition(spark, day2, prefix, batch="day2")
    # batch stats rows stay per-ingest and sum associatively
    assert spark.table(f"{prefix}_stats").count() == 2
    expect = _rows(bm25_top_k(spark, docs, TERMS, k=15))
    got = _rows(bm25_indexed_top_k(spark, prefix, TERMS, k=15))
    assert got == expect


def test_query_term_filter_pushes_into_postings_scan(spark, sf_dir):
    prefix = ensure_bm25_index(spark, sf_dir)
    plan = formatted_plan(
        spark.table(f"{prefix}_postings").where(F.col("token").isin(TERMS))
    )
    assert "PushedFilters: [" in plan and "token" in plan.split(
        "PushedFilters:"
    )[1].split("]")[0]
