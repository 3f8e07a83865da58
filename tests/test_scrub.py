"""Scrubbing/governance operators: PII redaction, hash split, repetition,
benchmark contamination (datapipe/scrub.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.scrub import (
    hash_split,
    ngram_contamination,
    pii_counts,
    redact_pii,
    repetition_features,
)


def test_redact_pii_classes(spark):
    rows = [
        (1, "mail me at jane.doe+x@sub.example.org today"),
        (2, "call 555-123-4567 or visit 10.20.30.40 please"),
        (3, "card 4111111111111111 but year 2024 stays"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    counts = pii_counts("t")
    got = {
        r.id: r
        for r in df.select(
            "id",
            redact_pii("t").alias("red"),
            *[v.alias(k) for k, v in counts.items()],
        ).collect()
    }
    assert got[1].red == "mail me at <EMAIL> today" and got[1].n_email == 1
    assert got[2].red == "call <PHONE> or visit <IP> please"
    assert (got[2].n_phone, got[2].n_ip) == (1, 1)
    assert got[3].red == "card <NUM> but year 2024 stays"  # short runs kept
    assert got[3].n_number == 1
    assert got[4].red == "nothing sensitive here"
    assert sum([got[4].n_email, got[4].n_phone, got[4].n_ip, got[4].n_number]) == 0


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], ["id"])
    labeled = df.select("id", hash_split("id", train_pct=90).alias("s"))
    counts = {r.s: r["count"] for r in labeled.groupBy("s").count().collect()}
    frac = counts["train"] / 5000
    assert 0.87 < frac < 0.93  # first-hex-byte buckets: 230/256 ≈ 0.898
    # rerun → identical assignment (pure function of id+salt)
    again = {r.id: r.s for r in df.select("id", hash_split("id").alias("s")).collect()}
    first = {r.id: r.s for r in labeled.collect()}
    assert first == again
    # different salt → different assignment for some ids
    other = {r.id: r.s
             for r in df.select("id", hash_split("id", salt="v2").alias("s")).collect()}
    assert first != other
    with pytest.raises(ValueError):
        hash_split("id", train_pct=0)


def test_repetition_features_flags_boilerplate(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),          # all repeats
        (2, "every word here is totally unique text"), # no repeats
        (3, "ab"),                                     # shorter than n words
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    feats = repetition_features("t", ns=(2, 3))
    got = {r.id: r for r in df.select(
        "id", *[v.alias(k) for k, v in feats.items()]).collect()}
    assert got[1].dup_2gram_frac == 0.8   # 5 occurrences, 1 distinct
    assert got[1].dup_3gram_frac == 0.75  # 4 occurrences, 1 distinct
    assert got[2].dup_2gram_frac == 0.0 and got[2].dup_3gram_frac == 0.0
    assert got[3].dup_2gram_frac == 0.0   # no 2-grams at all → 0, not null


def test_ngram_contamination_finds_overlap(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, base),                                   # benchmark doc
        (2, base + " extra tail words here appended"),  # shares 8-grams
        (3, "completely different text with no overlapping eight gram runs at all ok"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = docs.where(F.col("doc_id") == 1)
    out = {r.doc_id: r for r in ngram_contamination(docs, bench, n=8).collect()}
    assert out[1].contamination_frac == 1.0  # benchmark doc vs itself
    assert 2 in out and out[2].n_contaminated == 5  # 12-word overlap → 5 shared 8-grams
    assert 3 not in out  # clean doc emits no row

    # plan shape: benchmark side must broadcast (no corpus-scale shuffle)
    from telemetry_parquet_spark.plans.explain import has_broadcast_join

    assert has_broadcast_join(ngram_contamination(docs, bench, n=8))


def test_weighted_sample_proportional_and_deterministic(spark):
    """Per-stratum kept fraction tracks the stratum's rate (at 1/256 bucket
    resolution), the kept SET is identical across reruns/repartitionings,
    and strata without a weights row drop entirely."""
    from telemetry_parquet_spark.datapipe.scrub import weighted_sample

    n = 4000
    rows = [(i, ["web", "code", "forum", "ghost"][i % 4]) for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    weights = spark.createDataFrame(
        [("web", 100), ("code", 50), ("forum", 10)], ["source", "rate_pct"]
    )
    kept = weighted_sample(df, weights, "source", "doc_id")
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    per_stratum = n // 4
    assert counts["web"] == per_stratum                      # 100% keeps all
    assert abs(counts["code"] / per_stratum - 128 / 256) < 0.05
    assert abs(counts["forum"] / per_stratum - 26 / 256) < 0.05
    assert "ghost" not in counts                             # no weights row = 0%

    ids_a = {r.doc_id for r in kept.collect()}
    ids_b = {r.doc_id for r in weighted_sample(
        df.repartition(13), weights, "source", "doc_id").collect()}
    assert ids_a == ids_b

    # re-salting re-rolls membership but preserves proportions
    resalted = {r.doc_id for r in weighted_sample(
        df, weights, "source", "doc_id", salt="mix-v2").collect()}
    assert resalted != ids_a


def test_weighted_sample_never_shuffles_corpus(spark):
    """The weights join must broadcast — a sort-merge join here would
    shuffle the full corpus to apply a per-domain rate."""
    from telemetry_parquet_spark.datapipe.scrub import weighted_sample
    from telemetry_parquet_spark.plans.explain import formatted_plan

    df = spark.createDataFrame([(i, f"s{i % 3}") for i in range(100)],
                               ["doc_id", "source"])
    weights = spark.createDataFrame([(f"s{j}", 50) for j in range(3)],
                                    ["source", "rate_pct"])
    plan = formatted_plan(weighted_sample(df, weights, "source", "doc_id"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_strip_html_semantics(spark):
    from telemetry_parquet_spark.datapipe.scrub import strip_html

    rows = [
        (1, '<div class="x"><p>hello <b>world</b></p></div>'),
        (2, "a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; f&nbsp;g"),
        (3, "keep <script type='t'>var s = 'DROP ME';</script> going"),
        (4, "keep <style>body { color: red }</style> going"),
        (5, "  lots   of \t whitespace  "),
        (6, "plain text untouched"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {r.id: r.c for r in df.select("id", strip_html("t").alias("c")).collect()}
    assert got[1] == "hello world"
    assert got[2] == "a & b <c> \"d\" 'e' f g"
    # script/style BODIES are dropped, not just the tags
    assert got[3] == "keep going" and got[4] == "keep going"
    assert got[5] == "lots of whitespace"
    assert got[6] == "plain text untouched"
    # idempotent on already-clean text (decoded entities don't re-strip)
    again = {
        r.id: r.c2
        for r in df.select(
            "id", strip_html(strip_html("t")).alias("c2")
        ).collect()
    }
    assert again[1] == got[1] and again[5] == got[5]


def test_strip_html_script_bodies_with_markup(spark):
    """Round-5 ADVICE: script/style bodies containing '<' (comparisons,
    nested markup) must be REMOVED, not leaked as raw JS/CSS text; and
    mismatched pairs like <script>…</style> must not be treated as one
    block (RE2 has no backreferences, so script/style are separate
    non-greedy patterns)."""
    from telemetry_parquet_spark.datapipe.scrub import strip_html

    rows = [
        (1, "keep <script>if (a < b) { run(); }</script> going"),
        (2, "keep <style>@media (max-width: 10px) { a < b }</style> going"),
        (3, "keep <script>var t = '<div>html in js</div>';</script> going"),
        # mismatched pair: the script block never closes, the style tag is
        # stripped as a generic tag — body text survives (it is NOT inside
        # a well-formed script element)
        (4, "a <script>leak</style> b"),
        # two script blocks: non-greedy must stop at the FIRST close tag
        (5, "x <script>one</script> mid <script>two</script> y"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {r.id: r.c for r in df.select("id", strip_html("t").alias("c")).collect()}
    assert got[1] == "keep going"
    assert got[2] == "keep going"
    assert got[3] == "keep going"
    assert got[4] == "a leak b"
    assert got[5] == "x mid y"


def test_dsir_fixedpoint_scores_rank_target_like_docs(spark):
    """DSIR fixed-point scores must rank a document sharing the TARGET
    slice's vocabulary above one sharing only the raw-background
    vocabulary — even when neither is in the target slice — and every
    score is bounded by n_grams · scale (ratio ≤ scale since target ⊆
    raw)."""
    from telemetry_parquet_spark.datapipe.scrub import dsir_fixedpoint_scores

    rows = []
    for i in range(20):  # target slice: vocabulary A
        rows.append((i, "alpha beta gamma alpha beta"))
    for i in range(20, 60):  # background: vocabulary B
        rows.append((i, "delta epsilon zeta delta epsilon"))
    rows.append((100, "alpha beta gamma"))  # target-LIKE, not in target
    rows.append((101, "delta epsilon zeta"))  # background-like
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.score
        for r in dsir_fixedpoint_scores(
            docs, is_target=F.col("doc_id") < 20, buckets=64
        ).collect()
    }
    assert got[100] > got[101]
    # 3 unigrams + 2 bigrams = 5 grams; ratio ≤ scale
    assert got[100] <= 5 * 1_000_000
    assert got[101] >= 5  # Laplace floor: every gram contributes ≥ 1
