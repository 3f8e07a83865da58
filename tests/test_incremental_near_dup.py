"""incremental_near_dup (datapipe/dedup.py): planted cross-day near-dups,
keep semantics, and the two-sided (never self-join) shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.dedup import incremental_near_dup


@pytest.fixture(scope="module")
def split(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    hist = [
        (1, base),
        (2, "completely different historical text with many unique words here"),
        (3, base + " with a tiny suffix change"),
    ]
    new = [
        (101, base),  # exact dup of 1 (and near 3)
        (102, "entirely novel content that matches nothing in the archive"),
        (103, base + " with a tiny suffix change"),  # exact dup of 3
    ]
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(new, schema),
        spark.createDataFrame(hist, schema),
    )


def test_labels_and_keeps(split):
    new_day, history = split
    out = {r.doc_id: r for r in incremental_near_dup(new_day, history).collect()}
    assert len(out) == 3  # every new doc labeled
    assert out[101].kept is False and out[101].dup_of == 1  # earliest match
    assert out[103].kept is False and out[103].dup_of in (1, 3)
    assert out[102].kept is True and out[102].dup_of is None


def test_history_never_self_joins(split):
    """History-internal duplicates must NOT appear: only new-vs-history
    pairs are considered (history was deduped when it was ingested)."""
    new_day, history = split
    # doc 1 and 3 are near-dups of each other inside history; a self-join
    # formulation would also emit labels for them
    out_ids = {
        r.doc_id for r in incremental_near_dup(new_day, history).collect()
    }
    assert out_ids == {101, 102, 103}


def test_empty_new_day(split, spark):
    _, history = split
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert incremental_near_dup(empty, history).count() == 0
