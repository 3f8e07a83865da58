"""Ranked-retrieval queries (BM25) over the documents table.

The retrieval-side companion of ``tfidf_top_terms``: where that query
profiles each document's own salient terms, BM25 answers the search-engine
question — which documents best match THIS query bag — with the Okapi
saturation + length-normalization model (see datapipe/retrieval.py for the
scale shape and the order-independent integer-sum trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from telemetry_parquet_spark.queries.registry import ORACLE, query
from telemetry_parquet_spark.sources.tables import load_table

_QUERY_TERMS = ["vector", "window", "stream"]


@query(
    "bm25_topk_docs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        t -> length(t) > 0)) AS token
      FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_dl
      FROM dl
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM toks WHERE token IN ('vector', 'window', 'stream')
      GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ), contrib AS (
      SELECT tf.doc_id,
             CAST(round(
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5)
                        / (CAST(d.df AS DOUBLE) + 0.5))
               * CAST(tf.tf AS DOUBLE) * 2.2
               / (CAST(tf.tf AS DOUBLE)
                  + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE)
                           / (CAST(s.total_dl AS DOUBLE)
                              / CAST(s.n_docs AS DOUBLE))))
               * 1000000.0) AS BIGINT) AS micros
      FROM tf
      JOIN df d USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
    ), scored AS (
      SELECT doc_id, CAST(SUM(micros) AS BIGINT) AS bm25_micros
      FROM contrib GROUP BY 1
    )
    SELECT doc_id, bm25_micros,
           round(CAST(bm25_micros AS DOUBLE) / 1000000.0, 6) AS bm25
    FROM scored
    ORDER BY bm25_micros DESC, doc_id ASC
    LIMIT 15
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-15 documents for the query bag ('vector', 'window',
    'stream'), k1=1.2, b=0.75, Lucene-style non-negative idf.

    Postings are pruned to the query terms by a broadcast semi-join BEFORE
    the tf aggregation; corpus stats (N, Σdl) re-enter the plan as a 1-row
    broadcast; per-term contributions are summed as micro-scaled BIGINTs
    so the score is order-independent and exactly reproduced by the DuckDB
    oracle; top-k compiles to TakeOrderedAndProject."""
    from telemetry_parquet_spark.datapipe.retrieval import bm25_top_k

    docs = load_table(spark, sf_dir, "documents")
    return bm25_top_k(spark, docs, _QUERY_TERMS, k=15)


@query(
    "bm25_indexed_topk",
    oracle=ORACLE["bm25_topk_docs"],
)
def bm25_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical query bag and scoring as ``bm25_topk_docs``, served from
    the MATERIALIZED inverted index (datapipe/retrieval.py: bucketed
    token-sorted postings + doc lengths + associative batch stats): the
    corpus is tokenized once at build; each query reads only the query
    terms' postings (isin pushdown into the sorted bucketed scan). Same
    oracle as the scan-time query — both must produce the same rows. The
    index build is fingerprint-guarded, so a regenerated corpus forces a
    rebuild instead of serving stale postings."""
    from telemetry_parquet_spark.datapipe.retrieval import (
        bm25_indexed_top_k,
        ensure_bm25_index,
    )

    prefix = ensure_bm25_index(spark, sf_dir)
    return bm25_indexed_top_k(spark, prefix, _QUERY_TERMS, k=15)
