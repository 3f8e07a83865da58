"""Behavior tests for the corpus-construction operators (boilerplate
removal, per-domain cap, quantile profiling, vocabulary build) beyond the
oracle-parity gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.boilerplate import (
    cap_per_stratum,
    hot_segments,
    remove_boilerplate,
    segment_table,
)
from telemetry_parquet_spark.sources.tables import load_table


def _docs(spark):
    rows = [
        # BANNER repeats across 4 docs as a full 4-word window
        (1, "cookie banner accept all unique content one here", "s1"),
        (2, "cookie banner accept all other words entirely different", "s1"),
        (3, "cookie banner accept all third document body text", "s2"),
        (4, "cookie banner accept all fourth doc payload words", "s2"),
        (5, "no template at all just original writing here", "s3"),
        (6, "cookie banner accept all", "s3"),  # pure boilerplate
        (7, "tail stub words", "s3"),  # short doc, only a stub window
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_remove_boilerplate_strips_hot_windows(spark):
    out = remove_boilerplate(
        _docs(spark), seg_words=4, min_df=3
    ).orderBy("doc_id").collect()
    by_id = {r.doc_id: r for r in out}
    # the banner window is removed from every doc containing it
    for i in (1, 2, 3, 4):
        assert "cookie banner accept all" not in by_id[i].clean_text
        assert by_id[i].n_kept == by_id[i].n_segs - 1
    # untouched doc survives byte-identical
    assert by_id[5].clean_text == "no template at all just original writing here"
    # pure-boilerplate doc survives as empty, not dropped
    assert by_id[6].clean_text == "" and by_id[6].n_kept == 0
    # tail stubs are never hot-set candidates
    assert by_id[7].clean_text == "tail stub words"


def test_hot_segments_requires_full_windows(spark):
    segs = segment_table(_docs(spark), seg_words=4)
    hot = hot_segments(segs, min_df=3).collect()
    assert [h.seg for h in hot] == ["cookie banner accept all"]
    assert hot[0].doc_freq == 5  # docs 1,2,3,4,6


def test_cap_per_stratum_deterministic_and_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    capped = cap_per_stratum(docs, "source", "doc_id", k=10)
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in per)
    # rerun + repartition stability: same kept set
    again = cap_per_stratum(docs.repartition(13), "source", "doc_id", k=10)
    assert sorted(r.doc_id for r in capped.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )
    # a different salt re-rolls the selection
    rerolled = cap_per_stratum(docs, "source", "doc_id", k=10, salt="cap-v2")
    assert sorted(r.doc_id for r in capped.select("doc_id").collect()) != sorted(
        r.doc_id for r in rerolled.select("doc_id").collect()
    )


def test_cap_salted_two_phase_identical(spark, sf_dir):
    """The skew-guard (two-phase salted rank) must return EXACTLY the same
    kept set as the direct per-stratum window."""
    docs = load_table(spark, sf_dir, "documents")
    direct = cap_per_stratum(docs, "source", "doc_id", k=7)
    salted = cap_per_stratum(docs, "source", "doc_id", k=7, salt_buckets=4)
    assert sorted(r.doc_id for r in direct.select("doc_id").collect()) == sorted(
        r.doc_id for r in salted.select("doc_id").collect()
    )


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """The 100 TB path (approx_percentile sketch) stays within 5% relative
    error of the exact per-language quantiles it replaces."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("n_chars").cast("double")
    both = (
        docs.groupBy("lang")
        .agg(
            F.percentile(c, 0.5).alias("exact"),
            F.approx_percentile(c, F.lit(0.5), F.lit(10000)).alias("approx"),
        )
        .collect()
    )
    for r in both:
        assert abs(r.approx - r.exact) <= 0.05 * max(r.exact, 1.0)


def test_vocab_ids_dense_and_rank_ordered(spark, sf_dir):
    from telemetry_parquet_spark.queries.corpus import vocab_table

    vocab = vocab_table(spark, sf_dir).collect()
    ids = sorted(v.token_id for v in vocab)
    assert ids == list(range(1, len(vocab) + 1))
    by_rank = sorted(vocab, key=lambda v: v.token_id)
    counts = [v.n for v in by_rank]
    assert counts == sorted(counts, reverse=True)


def test_global_sort_index_matches_naive_window(spark, sf_dir):
    from pyspark.sql import Window

    from telemetry_parquet_spark.operators.global_index import global_sort_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    got = {
        r.doc_id: r.global_idx
        for r in global_sort_index(docs.repartition(17), order).collect()
    }
    naive = {
        r.doc_id: r.idx
        for r in docs.withColumn(
            "idx", F.row_number().over(Window.orderBy(*order)) - 1
        ).collect()
    }
    assert got == naive
    # dense, 0-based
    assert sorted(got.values()) == list(range(len(got)))


def test_global_sort_index_avoids_single_partition_sort(spark, sf_dir):
    """The executed plan must range-partition the sort, not funnel through
    one task (no unpartitioned Window over the full input)."""
    from telemetry_parquet_spark.operators.global_index import global_sort_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = global_sort_index(docs, [F.col("n_chars").desc(), F.col("doc_id").asc()])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window that assigns row numbers is partitioned by __pid
    assert "windowspecdefinition(__pid" in plan


def test_boilerplate_hot_join_is_broadcast(spark, sf_dir):
    """The removal filter must broadcast the hot set — a shuffled anti-join
    here would re-shuffle the whole corpus at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    out = remove_boilerplate(docs, seg_words=8, min_df=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_repeated_spans_positions(spark):
    from telemetry_parquet_spark.datapipe.dedup import repeated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 toks
    rows = [
        (1, "intro words here now " + shared + " tail one"),
        (2, shared + " totally different ending text"),
        (3, "no duplication in this document at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.doc_id): (r.span_start, r.span_end, r.n_grams)
        for r in repeated_spans(df, window=8).collect()
    }
    # doc 1: shared passage = tokens 5..14 -> repeated 8-gram starts 5,6,7
    assert out[1] == (5, 14, 3)
    # doc 2: same passage at tokens 1..10 -> starts 1,2,3
    assert out[2] == (1, 10, 3)
    # doc 3: nothing flagged
    assert 3 not in out


def test_repeated_spans_merges_touching_windows(spark):
    from telemetry_parquet_spark.datapipe.dedup import repeated_spans

    # two shared passages separated by a long unique middle -> TWO islands
    p1 = "a b c d e f g h"          # 8 tokens
    p2 = "s t u v w x y z"          # 8 tokens
    rows = [
        (1, p1 + " uniqueone uniquetwo uniquethree uniquefour uniquefive "
            "uniquesix uniqueseven uniqueeight uniquenine " + p2),
        (2, p1 + " other filler entirely " + p2),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(df, window=8).collect()
        if r.doc_id == 1
    )
    assert spans == [(1, 1, 8), (1, 18, 25)]


def test_cap_budget_semantics(spark):
    from telemetry_parquet_spark.datapipe.boilerplate import cap_budget_per_stratum

    rows = [(i, "s1", 100) for i in range(1, 11)] + [(99, "s2", 5000)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    kept = cap_budget_per_stratum(df, budget=350).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r.doc_id)
    # s1: exactly 3 docs of 100 chars fit a 350 budget (4th would hit 400)
    assert len(by_src["s1"]) == 3
    # s2's only doc exceeds the budget alone -> stratum keeps nothing
    assert "s2" not in by_src
    # deterministic under repartition
    again = cap_budget_per_stratum(df.repartition(7), budget=350).collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in again)


def test_quantize_int8_cosine_error_bounded(spark, sf_dir):
    """Dequantized vectors must preserve cosine similarity to within 2% —
    the property that makes int8 storage usable for retrieval."""
    import math

    from telemetry_parquet_spark.datapipe.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    codes, scale = quantize_int8(F.col("embedding"))
    rows = emb.select("vec_id", "embedding", codes.alias("q"), scale.alias("s")).collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    ref = rows[0]
    deq = {r.vec_id: [c * r.s / 127 for c in r.q] for r in rows}
    for r in rows[1:]:
        exact = cos(ref.embedding, r.embedding)
        approx = cos(deq[ref.vec_id], deq[r.vec_id])
        assert abs(exact - approx) <= 0.02
    # codes are genuinely int8-range
    for r in rows:
        assert all(-127 <= c <= 127 for c in r.q)


def test_dq_checks_fire_on_injected_violations(spark):
    """The driver corpus is clean (all counts 0), so prove each constraint
    actually DETECTS: inject a duplicate key, a null FK, an out-of-range
    quantity, a bad status, and an orphaned order."""
    from telemetry_parquet_spark.queries.corpus import dq_checks

    li = spark.createDataFrame(
        [(1, 1, 10.0), (1, 1, 20.0), (2, 1, 99.0)],  # dup PK + qty 99
        ["l_orderkey", "l_linenumber", "l_quantity"],
    )
    orders = spark.createDataFrame(
        [(1, 10, "O"), (2, None, "X"), (3, 999, "F")],  # null FK, bad status, orphan
        ["o_orderkey", "o_custkey", "o_orderstatus"],
    )
    cust = spark.createDataFrame([(10,)], ["c_custkey"])
    got = {r.check_name: r.violations for r in dq_checks(li, orders, cust).collect()}
    assert got == {
        "lineitem_pk_unique": 1,
        "orders_custkey_complete": 1,
        "lineitem_quantity_range": 1,
        "orders_status_domain": 1,
        # left_anti counts the NULL-custkey row too (NULL matches nothing),
        # so FK sees both the null row and the orphaned custkey 999
        "orders_custkey_fk": 2,
    }


def test_encode_covers_every_token(spark, sf_dir):
    """Cross-operator consistency on the text→tensor path: the vocabulary
    is built from the same corpus it encodes, so encode_token_ids must
    cover EVERY whitespace token of every document (its n_tokens equals
    token_counting's ws_tokens doc for doc)."""
    from telemetry_parquet_spark.queries.corpus import (
        encode_token_ids,
        token_counting,
    )

    enc = {r.doc_id: r.n_tokens for r in encode_token_ids(spark, sf_dir).collect()}
    ws = {r.doc_id: r.ws_tokens for r in token_counting(spark, sf_dir).collect()}
    assert enc == {k: v for k, v in ws.items() if v > 0}


def test_approx_ndv_tracks_exact(spark, sf_dir):
    """The at-scale NDV path (HLL approx_count_distinct, one pass for all
    columns) stays within 5% of the exact distinct counts."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.count_distinct("l_orderkey").alias("e1"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("a1"),
        F.count_distinct("l_partkey").alias("e2"),
        F.approx_count_distinct("l_partkey", 0.02).alias("a2"),
    ).collect()[0]
    # rsd=0.02 configured; allow 3 standard deviations
    assert abs(row.a1 - row.e1) <= 0.06 * row.e1
    assert abs(row.a2 - row.e2) <= 0.06 * row.e2


def test_weighted_priority_sample_bounds_and_stability(spark, sf_dir):
    from telemetry_parquet_spark.datapipe.boilerplate import (
        weighted_priority_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = weighted_priority_sample(docs, "source", "doc_id", "n_chars", k=8)
    per = got.groupBy("source").count().collect()
    assert per and all(r["count"] <= 8 for r in per)
    # partitioning-independent: derived u, not drawn
    again = weighted_priority_sample(
        docs.repartition(17), "source", "doc_id", "n_chars", k=8
    )
    assert sorted(r.doc_id for r in got.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )
    # salt re-roll changes the sample
    rerolled = weighted_priority_sample(
        docs, "source", "doc_id", "n_chars", k=8, salt="wps-v2"
    )
    assert sorted(r.doc_id for r in got.select("doc_id").collect()) != sorted(
        r.doc_id for r in rerolled.select("doc_id").collect()
    )


def test_weighted_priority_sample_respects_weights(spark):
    """A-ES law check: with weights 50:1 in one stratum, heavy rows must
    dominate the kept set across independent salt re-rolls — and zero/neg
    weights never appear. 20 heavy + 180 light, k=10: expected heavy share
    per draw is ~85-95%; across 8 salts a 60% floor is a >5σ bound."""
    from telemetry_parquet_spark.datapipe.boilerplate import (
        weighted_priority_sample,
    )

    rows = [(i, "s", 50.0 if i < 20 else 1.0) for i in range(200)]
    rows += [(900, "s", 0.0), (901, "s", -3.0)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    heavy = total = 0
    for salt in [f"roll-{i}" for i in range(8)]:
        kept = [
            r["doc_id"]
            for r in weighted_priority_sample(
                df, "source", "doc_id", "w", k=10, salt=salt
            ).collect()
        ]
        assert len(kept) == 10
        assert 900 not in kept and 901 not in kept
        heavy += sum(1 for d in kept if d < 20)
        total += len(kept)
    assert heavy / total > 0.6
