"""Bigram language-model training and perplexity-style quality scoring.

The CCNet recipe (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") filters web text by language-model perplexity:
documents whose per-token negative log-likelihood under a reference LM is an
outlier are boilerplate/gibberish and get dropped. The reference repo's
quality filters stop at rule-based scores (``quality_filter`` /
``quality_linear_score``); this module adds the statistical sibling as pure
relational plans — no Python in any hot path, no driver-side model state.

Model: add-one-smoothed bigram LM trained on the corpus itself,
``p(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V)`` with ``c(w1,·)`` the count of
``w1`` in bigram-first position (so probabilities sum to <= 1 per context) and
``V`` the distinct-token vocabulary size.

100 TB shape:
- Bigram extraction is ONE codegen pass per document — ``transform`` over the
  token array zips each token with its successor (`element_at`); no self-join
  on (doc, pos+1), no window. The exploded relation carries only
  ``(doc_id, w1, w2)``.
- Training is two map-side-combinable count aggregations (bigram and
  context), the same shape as ``vocab_table``.
- Scoring joins the per-document bigrams back to the two count tables keyed
  on ``(w1, w2)`` / ``w1`` — co-partitioned shuffle joins; at web scale the
  context table is vocab-sized (broadcastable), the bigram table is
  bigram-vocab-sized (shuffle join, AQE handles the Zipfian head's skew).
  ``V`` is a 1-row aggregate broadcast via crossJoin.
- Cross-engine exactness: every ``ln`` term is rounded to 9 decimals and cast
  to DECIMAL(28,9) BEFORE the per-document sum, so the sum is exact and
  task-order-independent (the ``registry.py`` decimal discipline); the final
  average is one double division rounded to 6dp on identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def doc_token_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, ts) — lowercase whitespace tokens, empties dropped; the same
    tokenization as ``vocab_table`` so LM scores compose with the vocab path."""
    return docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), TOKEN_SPLIT), lambda t: F.length(t) > 0
        ).alias("ts"),
    )


def doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair, via a single
    codegen ``transform``+``explode`` (no positional self-join)."""
    return (
        doc_token_arrays(docs)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(ts, 1, greatest(size(ts) - 1, 0)),"
                    " (t, i) -> struct(t AS w1, element_at(ts, i + 2) AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )


def bigram_counts(bi: DataFrame) -> DataFrame:
    """(w1, w2, c) — the trained model's numerator table."""
    return bi.groupBy("w1", "w2").agg(F.count("*").alias("c"))


def context_counts(bi: DataFrame) -> DataFrame:
    """(w1, cw) — bigram-first-position counts, the smoothing denominator."""
    return bi.groupBy("w1").agg(F.count("*").alias("cw"))


def vocab_size(docs: DataFrame) -> DataFrame:
    """1-row (vocab) — distinct tokens over every position."""
    return (
        doc_token_arrays(docs)
        .select(F.explode("ts").alias("t"))
        .agg(F.count_distinct("t").alias("vocab"))
    )


def perplexity_scores(docs: DataFrame, keep_threshold: float) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll, kept) — per-document average negative
    log-likelihood under the corpus's own add-one bigram LM; ``kept`` flags
    documents at or below ``keep_threshold`` (low NLL = predictable text).

    Every bigram observed at scoring time was observed at training time
    (same corpus), so smoothing only tempers the estimates — there are no
    unseen-pair branches in the plan.

    The bigram relation feeds three consumers (the scoring join source and
    both count tables); materialize it ONCE so the corpus is tokenized and
    exploded a single time — the same multi-consumer localCheckpoint
    discipline as ``semantic_prune`` and ``minhash_near_dup_pairs``.

    r13 optimization (guide §2.3): the ``w1`` (context-count) join moved
    from occurrence level to TYPE level. The model term is a function of
    the bigram type, so the two count tables pre-join into one
    pair-vocab-sized model table ``(w1, w2, t)`` and the occurrence
    relation passes through exactly ONE shuffle join (on ``(w1, w2)``)
    instead of two — at web scale the dropped join re-shuffled the whole
    exploded corpus on the Zipf-skewed ``w1`` key. (A further collapse of
    the occurrences to per-document type counts before the model join was
    measured and rejected: natural-text bigrams are nearly unique within
    a document, so the extra wide-key aggregation shuffles ~the same rows
    and cost +45% at sf0.1.) Arithmetic is unchanged — the same
    ``round(ln, 9) → decimal(28,9)`` term per type, summed over the same
    occurrences — so results are bit-identical."""
    bi = doc_bigrams(docs).localCheckpoint()
    model = (
        bigram_counts(bi)
        .join(context_counts(bi), ["w1"])
        .crossJoin(F.broadcast(vocab_size(docs)))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("cw") + F.col("vocab")).cast("double")
                    / (F.col("c") + F.lit(1)).cast("double")
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t"),
        )
    )
    return (
        bi.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("t").alias("s"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("s").cast("double") / F.col("n_bigrams"), 6).alias(
                "avg_nll"
            ),
        )
        .withColumn("kept", F.col("avg_nll") <= F.lit(keep_threshold))
    )
