"""Misra-Gries heavy-hitter sketch — the approximate, mergeable sibling of
``vocab_table``'s exact count for corpora where even the vocabulary
aggregate is large.

Shape (100 TB):
- partials: one Misra-Gries summary per input partition via Arrow
  ``mapInPandas`` — per-batch counting is pandas ``value_counts`` (C speed,
  never per-row Python); the k-counter compress touches at most
  k + distinct(batch) dict entries. Each partition emits ≤ k (term,
  cnt) rows plus one tally row carrying its total decrement, so the only
  shuffle in the pipeline moves k·P rows, NOT the vocabulary — this is
  the point of the sketch vs ``groupBy(term)``.
- merge: relational — sum partial counts per term (a k·P-row shuffle),
  sum the decrements, keep the top k by (count DESC, term ASC). Summing
  MG lower bounds is a valid merge: per partition
  ``freq_p − dec_p ≤ cnt_p ≤ freq_p`` (absence ⇒ ``freq_p ≤ dec_p``),
  so globally ``freq − Σdec_p ≤ Σcnt_p ≤ freq``.

Guarantees (classic MG, union-merge variant):
- bounds: for every emitted term, ``count_lb ≤ true ≤ count_lb + err_ub``
  with ``err_ub = Σ_p dec_p ≤ N/k``;
- presence: any term with true frequency > 2N/k is in the top-k output
  (its lower bound exceeds N/k, and at most k terms can);
- exactness: when every partition sees ≤ k distinct terms, no decrement
  ever fires — the sketch IS the exact count (``err_ub = 0``), which is
  what makes ``vocab_heavy_hitters`` a hash-exact driver gate while the
  lossy regime is property-tested.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_compress(counts: dict, k: int) -> tuple[dict, int]:
    """Shrink to ≤ k counters by subtracting the (k+1)-th largest count
    from all and dropping non-positives; returns (counters, decrement)."""
    if len(counts) <= k:
        return counts, 0
    vals = sorted(counts.values(), reverse=True)
    dec = vals[k]
    return {t: c - dec for t, c in counts.items() if c > dec}, dec


def mg_partials(df: DataFrame, term_col: str = "term", k: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ k (term, cnt, 0) rows plus
    one (NULL, 0, dec_total) tally row per partition."""
    import pandas as pd

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counts: dict = {}
        dec_total = 0
        for pdf in batches:
            for t, c in pdf[term_col].value_counts().items():
                counts[t] = counts.get(t, 0) + int(c)
            counts, dec = _mg_compress(counts, k)
            dec_total += dec
        yield pd.DataFrame(
            {
                "term": list(counts) + [None],
                "cnt": [int(c) for c in counts.values()] + [0],
                "dec": [0] * len(counts) + [dec_total],
            }
        )

    return df.select(F.col(term_col).alias(term_col)).mapInPandas(
        summarize, "term string, cnt long, dec long"
    )


def mg_topk(
    df: DataFrame, term_col: str = "term", k: int = 64
) -> DataFrame:
    """Merged top-k heavy hitters: (term, count_lb, err_ub) with
    count_lb ≤ true-frequency ≤ count_lb + err_ub."""
    partials = mg_partials(df, term_col=term_col, k=k)
    err = partials.agg(F.sum("dec").alias("err_ub"))  # 1 row
    return (
        partials.where(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("cnt").alias("count_lb"))
        .orderBy(F.desc("count_lb"), F.asc("term"))
        .limit(k)
        .crossJoin(F.broadcast(err))
    )
