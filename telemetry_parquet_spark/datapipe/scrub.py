"""Training-data scrubbing operators: PII redaction, deterministic
train/holdout splitting, and benchmark-contamination detection.

These are the governance passes a large-scale LLM data pipeline runs after
dedup/quality filtering (net-new surface — the reference predates the use
case; the brief's "operations a training-data pipeline would need").

Design for 100 TB:
- Redaction is a chain of ``regexp_replace`` expressions — whole-stage
  codegen, no Python, no shuffle; patterns are RE2-compatible so the DuckDB
  oracle replays them verbatim.
- The split is a pure hash of (id, salt) — no shuffle, no state, stable
  across reruns and cluster sizes, and computed identically by any engine
  with md5 (the bucket is the first hex byte of the digest, so no
  hex-to-int support is needed oracle-side).
- Contamination joins the corpus's exploded n-gram *hashes* (16-byte md5,
  never the raw text) against a broadcast benchmark n-gram set: shuffle
  payload is (doc_id, digest), the benchmark side is tiny by construction,
  and the per-doc aggregation is a map-side-combinable count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe import spread

# RE2-safe (no lookaround/backrefs): the same pattern strings run in Spark
# (java.util.regex) and DuckDB (RE2) with identical results on these shapes.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{13,19}\b", "<NUM>"),
)


def redact_pii(text: Column | str) -> Column:
    """Replace e-mail / phone / IPv4 / long-digit-run matches with typed
    placeholder tokens. Order matters: earlier (more specific) classes must
    not be re-matched by later (digit-run) ones."""
    c = F.col(text) if isinstance(text, str) else text
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-class match counts on the ORIGINAL text (audit columns)."""
    c = F.col(text) if isinstance(text, str) else text
    names = {"<EMAIL>": "n_email", "<PHONE>": "n_phone", "<IP>": "n_ip",
             "<NUM>": "n_number"}
    return {
        names[token]: F.regexp_count(c, F.lit(pattern))
        for pattern, token in PII_PATTERNS
    }


# RE2-safe (non-greedy DOTALL, no lookaround/backreferences) — identical
# semantics in Spark's java.util.regex and DuckDB's RE2, proven by the
# md5-compare oracle. script and style are SEPARATE patterns: RE2 has no
# backreferences, and a single alternation `<(script|style)...</(script|
# style)>` would accept mismatched pairs like <script>…</style>. The
# `.*?` body (vs the old `[^<]*`) also removes bodies containing '<'
# (comparison operators, nested markup) instead of leaking raw JS/CSS
# into the cleaned text.
_SCRIPT_BLOCKS: tuple[str, ...] = (
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
)
_ANY_TAG = r"<[^>]*>"
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
)


def strip_html(text: Column | str) -> Column:
    """Markup-to-clean-text normalization (the Common-Crawl ingest staple):
    drop script/style blocks WITH their bodies, strip remaining tags,
    decode the common entities, collapse whitespace, trim.

    Pure regexp_replace/replace chain — whole-stage codegen, no shuffle,
    no Python; order matters (entity decode after tag strip, so decoded
    '<'/'>' can't create new 'tags')."""
    c = F.col(text) if isinstance(text, str) else text
    for block in _SCRIPT_BLOCKS:
        c = F.regexp_replace(c, block, " ")
    c = F.regexp_replace(c, _ANY_TAG, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def hash_split(
    key: Column | str, train_pct: int = 90, salt: str = "split-v1"
) -> Column:
    """Deterministic train/holdout label from md5(key ∥ salt).

    The bucket is the digest's FIRST HEX BYTE (0..255) compared against
    ``round(256 * train_pct / 100)`` — engine-portable (string compare on
    the hex prefix; no hex-to-int needed) and stable under reruns, reparti-
    tioning, and cluster size. Changing ``salt`` re-rolls the assignment.

    Resolution is 1/256: the effective train share is
    ``round(256 * train_pct / 100) / 256`` — e.g. ``train_pct=90`` yields an
    expected 230/256 ≈ 89.84% train split, not exactly 90%."""
    if not 0 < train_pct < 100:
        raise ValueError(f"train_pct must be in (0, 100), got {train_pct}")
    c = F.col(key) if isinstance(key, str) else key
    threshold = format(round(256 * train_pct / 100), "02x")
    prefix = F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 2)
    return F.when(prefix < F.lit(threshold), F.lit("train")).otherwise(
        F.lit("holdout")
    )


def weighted_sample(
    df: DataFrame,
    weights: DataFrame,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix-v1",
    rate_col: str = "rate_pct",
) -> DataFrame:
    """Deterministic per-stratum (domain-mix) sampling: keep a row iff its
    md5(key ∥ salt) first-hex-byte bucket falls under its stratum's rate.

    ``weights`` is a (stratum, rate_pct∈[0,100]) table — tiny by definition
    (one row per corpus/domain), so it joins as a BROADCAST: the corpus is
    never shuffled, the filter is a pure projection, and the kept set is
    stable under reruns, repartitioning, and engine choice (same md5-prefix
    construction as ``hash_split``, same 1/256 rate resolution; rows whose
    stratum has no weights entry are dropped — an explicit 0% default).
    This is the data-mixing step of a corpus build: up/down-weight domains
    by table edit, not code change. The descendant of the reference's
    fixed-1% ``sample_id`` stratum filters (``MainEventsView.scala:79-82``)."""
    thr = F.lower(
        F.lpad(
            F.hex(F.round(F.lit(256) * F.col(rate_col) / 100).cast("int")), 2, "0"
        )
    )
    key = F.col(key_col).cast("string")
    prefix = F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 2)
    return (
        df.join(F.broadcast(weights), stratum_col)
        # rate >= 100 short-circuits: lpad would truncate '100' to '10'
        .where((F.col(rate_col) >= 100) | (prefix < thr))
    )


def _raw_word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams WITH duplicates (order preserved) — the repetition and
    contamination operators need multiplicity, unlike dedup's distinct
    shingles."""
    from telemetry_parquet_spark.datapipe.text import tokens

    toks = tokens(F.lower(text))
    k = F.size(toks) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_features(text: Column | str, ns: tuple[int, ...] = (2, 3)) -> dict[str, Column]:
    """Gopher-style repetition signals: for each n, the fraction of n-gram
    OCCURRENCES that are repeats of an earlier occurrence
    (1 - distinct/total; 0 for docs shorter than n words). High values flag
    boilerplate/spam documents that survive exact dedup."""
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    for n in ns:
        grams = _raw_word_ngrams(c, n)
        total = F.size(grams)
        distinct = F.size(F.array_distinct(grams))
        out[f"dup_{n}gram_frac"] = F.when(
            total > 0, F.round(1.0 - distinct / total, 6)
        ).otherwise(F.lit(0.0))
    return out


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination check: for every corpus document, the count
    and fraction of its word ``n``-grams that appear in ANY benchmark
    document. Join key is md5 of the n-gram (16-byte shuffle payload, never
    raw text); the distinct benchmark n-gram set is broadcast. Returns
    (id, n_ngrams, n_contaminated, contamination_frac) for contaminated
    docs only."""
    doc_grams = (
        spread(docs)
        .select(
            F.col(id_col),
            F.explode(_raw_word_ngrams(F.col(text_col), n)).alias("__g"),
        )
        .select(F.col(id_col), F.md5("__g").alias("__h"))
    )
    bench_grams = (
        benchmark.select(
            F.explode(_raw_word_ngrams(F.col(text_col), n)).alias("__g")
        )
        .select(F.md5("__g").alias("__h"))
        .distinct()
    )
    # r13 optimization (guide §2.3): one pass instead of two. A broadcast
    # LEFT join marks each gram occurrence as hit/miss, and a single
    # aggregation produces totals and hit counts together — the corpus
    # gram explode runs once (it ran twice before: totals pass + hits
    # pass), and the totals⋈hits join shuffle disappears. The inner-join
    # row set is preserved by keeping only docs with ≥ 1 hit.
    marked = doc_grams.join(
        F.broadcast(bench_grams.withColumn("__hit", F.lit(1))), "__h", "left"
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum("__hit").alias("n_contaminated"),
        )
        .where(F.col("n_contaminated").isNotNull())
        .select(
            F.col(id_col),
            "n_ngrams",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_ngrams"), 6).alias(
                "contamination_frac"
            ),
        )
    )


def dsir_fixedpoint_scores(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    scale: int = 1_000_000,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """DSIR-style hashed-n-gram importance scores (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"),
    integer fixed-point: per-document relevance to a TARGET slice,
    computed from bucketed n-gram statistics — the published recipe for
    steering a raw crawl toward a high-quality target distribution
    without training a classifier.

    Fixed-point variant (exactly oracle-able): each word n-gram (n ∈
    ``ns``, WITH multiplicity) lands in one of ``buckets`` cells via the
    engine-portable md5-nibble hash; ONE aggregation pass counts every
    bucket's raw occurrences (cr) and target occurrences (ct, target ⊆
    raw); the per-bucket importance ratio is the integer
    ``((ct+1)·scale) div (cr+1)`` — Laplace-smoothed, ≤ ``scale`` since
    target ⊆ raw — and a document's score is the integer SUM of its
    grams' ratios. Every step is exact int64 arithmetic, so the score is
    bit-identical on any engine and under any summation order (the
    production log-space float variant differs only by the monotone
    per-bucket log and a global constant; fixed-point keeps the gate
    exact — the kmeans_det/micro-cosine discipline).

    Scale shape (r13 optimization — guide §2.3/§2.4): the corpus is
    touched ONCE. A single explode (both n-gram orders concatenated into
    one pass) feeds one map-side-combinable aggregation to a persisted
    per-document bucket-count table (≤ ``buckets`` rows per document —
    the lightweight proxy of the gram stream); bucket stats, the ratio
    table, and the per-document score all derive from that proxy, so the
    gram-level explode+md5 work that previously ran twice (stats pass +
    scoring pass) runs exactly once, and the scoring shuffle carries
    (id, bucket, count) rows instead of one row per gram occurrence.
    Integer arithmetic is unchanged: Σ_grams ilr(b) ≡ Σ_buckets n·ilr(b)
    exactly (int64), so scores are bit-identical. Returns (id, score)."""
    from telemetry_parquet_spark.datapipe.dedup import md5_hash60

    base = spread(
        docs.where(F.col(text_col).isNotNull()).select(
            F.col(id_col), F.col(text_col), is_target.alias("__tgt")
        )
    )
    hashed = base.select(
        F.col(id_col),
        "__tgt",
        F.explode(
            F.concat(*[_raw_word_ngrams(F.col(text_col), n) for n in ns])
        ).alias("__g"),
    ).select(
        F.col(id_col), "__tgt",
        (md5_hash60(F.col("__g")) % buckets).alias("__b"),
    )
    per_doc = (
        hashed.groupBy(id_col, "__tgt", "__b")
        .agg(F.count("*").alias("__n"))
        .persist()  # session residue contract; evictable MEMORY_AND_DISK
    )
    stats = per_doc.groupBy("__b").agg(
        F.sum("__n").alias("cr"),
        F.sum(F.when(F.col("__tgt"), F.col("__n")).otherwise(F.lit(0))).alias(
            "ct"
        ),
    )
    spark = docs.sparkSession
    grid = spark.range(buckets).select(F.col("id").cast("long").alias("__b"))
    ilr = (
        grid.join(stats, "__b", "left")
        .select(
            "__b",
            F.expr(
                f"(coalesce(ct, 0L) + 1L) * {scale}L div "
                "(coalesce(cr, 0L) + 1L)"
            ).alias("__ilr"),
        )
    )
    return (
        per_doc.join(F.broadcast(ilr), "__b")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__ilr")).cast("long").alias("score"))
    )


def blocklist_hits(
    text: Column | str, blocklist: tuple[str, ...]
) -> dict[str, Column]:
    """Token-level blocklist scoring (badwords/NSFW/toxicity lists à la
    UT1): occurrence count and token count as pure codegen expressions —
    the blocklist inlines as an array literal, so there is NO join and no
    Python; at 100 TB this is a map-only pass. For multi-word or substring
    patterns, pre-normalize with ``strip_html``/``redact_pii`` and extend
    the filter to ``rlike`` on an alternation — same map-only shape."""
    c = F.col(text) if isinstance(text, str) else text
    ts = F.filter(F.split(F.lower(c), r"\s+"), lambda t: F.length(t) > 0)
    bl = F.array(*[F.lit(t) for t in blocklist])
    return {
        "n_tokens": F.size(ts).cast("int"),
        "n_blocked": F.size(
            F.filter(ts, lambda t: F.array_contains(bl, t))
        ).cast("int"),
    }
