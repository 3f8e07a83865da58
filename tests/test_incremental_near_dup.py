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


# --- S-curve recall at mid similarity (round-8 de-risk) ---------------------
#
# The exact-oracle driver gate stays green only because the generated corpus
# has no qualifying pairs below J≈0.8 (the docstring says so honestly).
# These fixtures PLANT pairs at controlled shingle-Jaccard 0.5 / 0.65 / 0.8
# and gate measured recall against the documented S-curve prediction
# 1 - (1 - s^4)^16, so a data-generator change that introduces
# mid-similarity pairs breaks HERE (a recall bound) instead of silently
# degrading the driver's exact check.

# (L, k): doc = L unique tokens; the new twin shares the first k and swaps
# the rest for fresh tokens -> shingle Jaccard (k-2)/(2L-k-2) exactly.
_SIM_LEVELS = {
    0.5: (50, 34),
    0.65: (35, 28),
    0.8: (56, 50),
}
_PAIRS_PER_LEVEL = 80


def _planted_corpus(spark):
    import random

    rng = random.Random(8)
    hist_rows, new_rows, truth = [], [], {}
    next_id = 1000
    for s, (L, k) in _SIM_LEVELS.items():
        for p in range(_PAIRS_PER_LEVEL):
            tag = f"s{int(s * 100)}p{p}"
            base = [f"{tag}w{i}x{rng.randrange(1 << 30)}" for i in range(L)]
            twin = base[:k] + [
                f"{tag}f{i}x{rng.randrange(1 << 30)}" for i in range(L - k)
            ]
            hid, nid = next_id, next_id + 1
            next_id += 2
            hist_rows.append((hid, " ".join(base)))
            new_rows.append((nid, " ".join(twin)))
            truth[nid] = (hid, s)
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(new_rows, schema),
        spark.createDataFrame(hist_rows, schema),
        truth,
    )


def _recall_by_level(out_rows, truth):
    hit = {s: 0 for s in _SIM_LEVELS}
    for r in out_rows:
        if r.doc_id in truth and r.dup_of is not None:
            hid, s = truth[r.doc_id]
            if r.dup_of == hid:
                hit[s] += 1
    return {s: hit[s] / _PAIRS_PER_LEVEL for s in _SIM_LEVELS}


def test_mid_similarity_recall_matches_s_curve(spark):
    """Measured recall at s=0.5/0.65/0.8 must track 1-(1-s^4)^16 (b=16,
    r=4): high similarity is near-certain, s=0.5 misses ~36% BY DESIGN —
    the point of the gate is that the number is known and bounded, not
    silently wrong."""
    new_day, history, truth = _planted_corpus(spark)
    out = incremental_near_dup(new_day, history).collect()
    recall = _recall_by_level(out, truth)
    for s in _SIM_LEVELS:
        predicted = 1.0 - (1.0 - s**4) ** 16
        assert abs(recall[s] - predicted) <= 0.15, (
            f"s={s}: measured recall {recall[s]:.3f} vs predicted "
            f"{predicted:.3f}"
        )
    assert recall[0.8] >= 0.95


def test_narrow_bands_recover_mid_similarity_recall(spark):
    """The docstring's own mitigation: b=32, r=2 predicts miss
    (1-s^2)^32 ≈ 1e-4 at s=0.5 — recall at every planted level must be
    near-total once the bands narrow."""
    new_day, history, truth = _planted_corpus(spark)
    out = incremental_near_dup(new_day, history, bands=32).collect()
    recall = _recall_by_level(out, truth)
    for s in _SIM_LEVELS:
        assert recall[s] >= 0.97, f"s={s}: recall {recall[s]:.3f}"
