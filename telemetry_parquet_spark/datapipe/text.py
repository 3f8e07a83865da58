"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All pure built-in column expressions (JVM-side, codegen'd) — no Python UDFs
in the hot path, so these run at scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A deliberately small, deterministic per-language stopword table for the
# n-gram/stopword language-ID heuristic. Real deployments would broadcast a
# larger table; the mechanism (score = stopword hit density per language,
# argmax) is the operator.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "es"],
    "de": ["der", "die", "das", "und", "in", "zu", "den", "ist"],
    "fr": ["le", "la", "de", "et", "en", "que", "les", "est"],
}

# BPE-ish word/number/punctuation splitter for token counting (public GPT-2
# pre-tokenizer shape, simplified to what Spark's regex engine supports).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Whitespace tokens with empties removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via the BPE-style regex (regexp_count of the
    token pattern — one pass, no explode)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def stopword_count(text: Column | str, stopwords: list[str]) -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: lengths, token stats, punctuation and
    stopword ratios, alpha ratio. The downstream filter (e.g. Gopher-style
    rules) is a plain WHERE over these columns."""
    c = F.col(text_col)
    n_tok = token_count(c)
    return df.withColumns(
        {
            "q_n_chars": F.length(c).cast("long"),
            "q_n_tokens": n_tok.cast("long"),
            "q_mean_token_len": (
                F.when(n_tok > 0, (F.length(F.regexp_replace(c, r"\s+", "")) / n_tok))
            ).cast("double"),
            "q_punct_ratio": (
                F.when(
                    F.length(c) > 0,
                    F.regexp_count(c, F.lit(r"[^\w\s]")) / F.length(c),
                )
            ).cast("double"),
            "q_alpha_ratio": (
                F.when(
                    F.length(c) > 0,
                    F.regexp_count(c, F.lit(r"[A-Za-z]")) / F.length(c),
                )
            ).cast("double"),
            "q_stopword_ratio": (
                F.when(n_tok > 0, stopword_count(c, STOPWORDS["en"]) / n_tok)
            ).cast("double"),
        }
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-density language ID: score each language by stopword hits per
    token, argmax with a deterministic language-code tiebreak; 'und' when no
    language scores > 0."""
    scores = F.array(
        *[
            F.struct(
                stopword_count(F.col(text_col), sw).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in sorted(STOPWORDS.items())
        ]
    )
    # array_max on struct compares (hits, lang) lexicographically -> the tie
    # on hits breaks toward the later language code; flip lang ordering via
    # sort to make ties break toward the alphabetically-first code.
    best = F.array_max(scores)
    return df.withColumn(
        out_col,
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint(text: Column | str, n_words: int = 5) -> Column:
    """Deterministic document fingerprint: xxhash64 of the first ``n_words``
    normalized words (cheap rolling-hash analog for prefix dedup)."""
    c = F.col(text) if isinstance(text, str) else text
    prefix = F.array_join(F.slice(tokens(F.lower(c)), 1, n_words), " ")
    return F.xxhash64(prefix)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The analysis bundle used by the `text_stats` query."""
    return quality_features(df, text_col)
