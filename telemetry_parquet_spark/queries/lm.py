"""Bigram-LM queries: model training and perplexity quality scoring
(datapipe/lm.py), both with exact DuckDB oracles.

Extends the reference's rule-based quality filters
(``TelemetryUtils``-style scalar scoring; see ``quality_filter`` /
``quality_linear_score``) with the statistical CCNet-style filter a
training-data pipeline needs. Cross-engine float discipline per
``queries/registry.py``: round-then-DECIMAL before any sum over doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe import lm
from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table

# Documents at or below this average negative log-likelihood (nats/bigram)
# are "kept": predictable, natural text. The constant sits mid-distribution
# at the test SFs (observed p25–p90 ≈ 3.37–3.42 at sf0.001 and sf0.01) so
# both branches of the flag are exercised.
NLL_KEEP_THRESHOLD = 3.4

TOP_BIGRAMS = 1000

_TOKS_CTE = """
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> length(x) > 0) AS ts
  FROM documents WHERE text IS NOT NULL
),
bi AS (
  SELECT doc_id, ts[p] AS w1, ts[p + 1] AS w2
  FROM toks, LATERAL unnest(range(1, len(ts))) AS u(p)
)
"""


@query(
    "lm_bigram_train",
    oracle=f"""
    WITH {_TOKS_CTE}
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
    FROM bi GROUP BY w1, w2
    ORDER BY c DESC, w1, w2 LIMIT {TOP_BIGRAMS}
    """,
)
def lm_bigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the bigram table; surface the top-{TOP_BIGRAMS} by (count desc,
    w1, w2) — a deterministic TakeOrderedAndProject over the full
    map-side-combinable count aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = lm.bigram_counts(lm.doc_bigrams(docs))
    return counts.orderBy(
        F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(TOP_BIGRAMS)


@query(
    "lm_perplexity_score",
    oracle=f"""
    WITH {_TOKS_CTE},
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
           FROM bi GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cw FROM bi GROUP BY w1),
    v AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS vocab
          FROM toks, LATERAL unnest(ts) AS u(t)),
    terms AS (
      SELECT bi.doc_id,
             CAST(ROUND(ln(CAST(c1.cw + v.vocab AS DOUBLE)
                           / CAST(c2.c + 1 AS DOUBLE)), 9)
                  AS DECIMAL(28,9)) AS t
      FROM bi
      JOIN c2 USING (w1, w2)
      JOIN c1 USING (w1)
      CROSS JOIN v
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(t) AS DOUBLE) / COUNT(*), 6) AS avg_nll,
           ROUND(CAST(SUM(t) AS DOUBLE) / COUNT(*), 6)
             <= {NLL_KEEP_THRESHOLD!r} AS kept
    FROM terms GROUP BY doc_id
    """,
)
def lm_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average NLL under the corpus's own add-one bigram LM,
    plus the CCNet-style keep flag. Exact oracle: each ln term is rounded
    to 9dp and summed as DECIMAL(28,9), so the per-doc sum is bit-identical
    across engines and task orderings."""
    docs = load_table(spark, sf_dir, "documents")
    return lm.perplexity_scores(docs, NLL_KEEP_THRESHOLD)


MIN_PAIR_COUNT = 5
TOP_COLLOCATIONS = 200


@query(
    "lm_pmi_collocations",
    oracle=f"""
    WITH {_TOKS_CTE},
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
           FROM bi GROUP BY w1, w2),
    u AS (SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS cu
          FROM toks, LATERAL unnest(ts) AS x(t) GROUP BY t),
    n AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_tokens FROM u)
    SELECT w1, w2, c12,
           ROUND(ln(CAST(c12 AS DOUBLE) * n.n_tokens
                    / (a.cu * CAST(b.cu AS DOUBLE))), 6) AS pmi
    FROM c2
    JOIN u a ON c2.w1 = a.w
    JOIN u b ON c2.w2 = b.w
    CROSS JOIN n
    WHERE c12 >= {MIN_PAIR_COUNT}
    ORDER BY pmi DESC, w1, w2 LIMIT {TOP_COLLOCATIONS}
    """,
)
def lm_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information over the corpus
    bigrams — ``ln(c12 * N / (c1 * c2))`` with unigram counts over every
    position, a min-count support cutoff, and a deterministic
    (pmi desc, w1, w2) top-k. The phrase-vocabulary pass of a tokenizer
    pipeline: high-PMI pairs are merge/phrase candidates that frequency
    alone (``lm_bigram_train``'s top-k) misses.

    Same join topology as the perplexity scorer — unigram table keyed by
    word (vocab-sized, broadcastable at scale), one final ln on identical
    double operands in both engines, rounded to 6dp."""
    docs = load_table(spark, sf_dir, "documents")
    toks = lm.doc_token_arrays(docs)
    c2 = lm.bigram_counts(lm.doc_bigrams(docs)).withColumnRenamed("c", "c12")
    uni = (
        toks.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    n = uni.agg(F.sum("cu").alias("n_tokens"))
    a = uni.select(F.col("w").alias("w1"), F.col("cu").alias("cu_a"))
    b = uni.select(F.col("w").alias("w2"), F.col("cu").alias("cu_b"))
    scored = (
        c2.where(F.col("c12") >= MIN_PAIR_COUNT)
        .join(a, ["w1"])
        .join(b, ["w2"])
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("n_tokens")
                    / (F.col("cu_a") * F.col("cu_b").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(TOP_COLLOCATIONS)
