"""Okapi BM25 ranked retrieval over the documents table.

The classic bag-of-words ranking function (Robertson & Walker, SIGIR '94;
the Lucene-style ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf that never goes
negative). Everything is relational:

- postings are PRUNED FIRST: the token explode is semi-joined to the
  (broadcast, handful-of-rows) query-term table before the tf aggregation,
  so the per-query work is proportional to the matching postings, never to
  the full corpus vocabulary;
- document length and the corpus-wide (N, avgdl) statistics come from one
  corpus-sized aggregation whose 1-row result re-enters the plan via a
  broadcast cross join — no driver round-trip, no second corpus scan for
  the scalar;
- the per-(doc, term) contributions are summed as SCALED INTEGERS
  (round(contrib * 1e6) cast to BIGINT — rounded to an integral double
  BEFORE the cast, since double→int casts truncate in Spark but round in
  DuckDB): double addition is not associative, so a float sum would depend
  on Spark's task order and diverge from any oracle — the integer sum is
  order-independent and bit-identical cross-engine.

At 100 TB the shape holds: tf/df are map-side-combinable hash aggregations
keyed on (doc, term) / term, the query-term table is always broadcast, and
the final top-k compiles to TakeOrderedAndProject (per-partition heaps — no
global sort). An inverted-index materialization (tf table written once,
queried many times) drops the per-query cost to a broadcast join against
the postings of the query terms only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe.text import tokens


def bm25_top_k(
    spark: SparkSession,
    docs: DataFrame,
    query_terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    Returns ``(doc_id, bm25)`` where ``bm25`` is the order-independent
    micro-scaled score divided back to a double (exactly reproducible —
    see module docstring). Ties break on ascending doc id.
    """
    toks = docs.select(
        F.col(doc_id), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )

    # Per-document length + 1-row corpus stats (N, avgdl as an exact
    # integer-sum ratio), broadcast back into the scoring plan.
    # dl fans out to the corpus-stats aggregate AND the scoring join;
    # persisting the (doc-sized, 2-column) relation saves a full re-tokenize
    # of the corpus for the stats pass. The returned plan is LAZY, so this
    # function cannot unpersist after the action it never runs — the blocks
    # follow the session residue contract (evictable MEMORY_AND_DISK;
    # release via session.clear_cached_relations between queries).
    dl = toks.groupBy(doc_id).agg(F.count("*").alias("dl")).persist()
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )

    qterms = spark.createDataFrame([(t,) for t in query_terms], ["token"])

    # Postings pruned to the query terms BEFORE the tf aggregation.
    tf = (
        toks.join(F.broadcast(qterms), "token")
        .groupBy(doc_id, "token")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.countDistinct(doc_id).alias("df"))

    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    contrib = idf * tf_d * F.lit(k1 + 1.0) / denom

    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, doc_id)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(doc_id),
            F.round(contrib * F.lit(1_000_000.0), 0)
            .cast("long")
            .alias("__micros"),
        )
        .groupBy(doc_id)
        .agg(F.sum("__micros").cast("long").alias("bm25_micros"))
    )
    return (
        scored.select(
            doc_id,
            "bm25_micros",
            F.round(F.col("bm25_micros").cast("double") / 1e6, 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25_micros"), F.asc(doc_id))
        .limit(k)
    )
