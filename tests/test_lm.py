"""Bigram LM (datapipe/lm.py): hand-computed model on a tiny corpus, scoring
identities, and the plan-shape guarantees the 100 TB story relies on."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe import lm


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "one"),  # single token -> no bigrams
        (4, None),  # null text -> dropped
        (5, "the cat sat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_bigrams_adjacency(tiny):
    got = {
        (r.doc_id, r.w1, r.w2)
        for r in lm.doc_bigrams(tiny).collect()
    }
    assert (1, "the", "cat") in got
    assert (1, "on", "the") in got
    assert (2, "cat", "ran") in got
    # no bigram crosses a document boundary, none from 1-token/null docs
    assert not any(d in (3, 4) for d, _, _ in got)
    assert len(got) == 5 + 2 + 2  # doc1 five, doc2 two, doc5 two


def test_counts_are_consistent(tiny):
    bi = lm.doc_bigrams(tiny)
    c2 = {(r.w1, r.w2): r.c for r in lm.bigram_counts(bi).collect()}
    c1 = {r.w1: r.cw for r in lm.context_counts(bi).collect()}
    assert c2[("the", "cat")] == 3
    assert c2[("cat", "sat")] == 2
    # context count == sum of bigram counts per first token
    for w1, cw in c1.items():
        assert cw == sum(c for (a, _), c in c2.items() if a == w1)


def test_hand_computed_nll(tiny, spark):
    """Doc 2 = 'the cat ran': NLL terms from the closed-form model."""
    v = lm.vocab_size(tiny).collect()[0].vocab
    assert v == 7  # the cat sat on mat ran one
    scored = {r.doc_id: r for r in lm.perplexity_scores(tiny, 99.0).collect()}
    # c(the,cat)=3, c(the,.)=4 ; c(cat,ran)=1, c(cat,.)=3
    t1 = round(math.log((4 + v) / (3 + 1)), 9)
    t2 = round(math.log((3 + v) / (1 + 1)), 9)
    expect = round((t1 + t2) / 2, 6)
    assert scored[2].n_bigrams == 2
    assert scored[2].avg_nll == pytest.approx(expect, abs=1e-9)
    assert scored[2].kept  # threshold 99 keeps everything
    assert 3 not in scored and 4 not in scored


def test_repetitive_text_scores_lower(spark):
    """An LM trained on a mixed corpus scores the repeated document as far
    more predictable — the CCNet signal the filter exists for."""
    rows = [(1, "spam " * 50)] + [
        (i, f"unique words number{i} follow here now token{i}")
        for i in range(2, 12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scored = {r.doc_id: r.avg_nll for r in lm.perplexity_scores(docs, 0.0).collect()}
    assert scored[1] < min(v for k, v in scored.items() if k != 1)


def test_no_python_udf_in_plan(tiny):
    plan = lm.perplexity_scores(tiny, 1.0)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_broadcast_in_plan(tiny):
    plan = lm.perplexity_scores(tiny, 1.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
