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

import os

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
    if len(set(query_terms)) != len(query_terms):
        # a duplicated term would double its contribution rows below but
        # doubled the tf inside ONE row in the previous two-pass shape —
        # BM25 is nonlinear in tf, so refuse loudly instead of diverging
        raise ValueError("bm25_top_k: query_terms must be distinct")
    toks = docs.select(
        F.col(doc_id), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )

    # ONE tokenize pass: a single map-side-combinable aggregation yields
    # the per-document length AND the per-query-term counts (bounded
    # column fan-out — the query is a literal bag of words by contract).
    # The previous shape tokenized the corpus twice: once for dl, once
    # for the term-pruned tf aggregation. The 1-row corpus stats
    # (N, avgdl as an exact integer-sum ratio) broadcast back into the
    # scoring plan. per_doc fans out to stats, dl, and tf; persisting the
    # (doc-sized) relation keeps it one pass. The returned plan is LAZY,
    # so this function cannot unpersist after the action it never runs —
    # the blocks follow the session residue contract (evictable
    # MEMORY_AND_DISK; release via session.clear_cached_relations
    # between queries).
    per_doc = (
        toks.groupBy(doc_id)
        .agg(
            F.count("*").alias("dl"),
            *[
                F.sum(
                    F.when(F.col("token") == t, 1).otherwise(0)
                ).alias(f"__tf{i}")
                for i, t in enumerate(query_terms)
            ],
        )
        .persist()
    )
    stats = per_doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    dl = per_doc.select(doc_id, "dl")
    # melt the per-term columns back to (doc, token, tf > 0) postings —
    # identical rows to the previous term-pruned aggregation
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("token"), F.col(f"__tf{i}").alias("tf")
            )
            for i, t in enumerate(query_terms)
        ]
    )
    tf = (
        per_doc.select(F.col(doc_id), F.explode(entries).alias("__e"))
        .select(doc_id, F.col("__e.token").alias("token"), F.col("__e.tf").alias("tf"))
        .where(F.col("tf") > 0)
    )
    return _score_topk(tf, dl, stats, k=k, k1=k1, b=b, doc_id=doc_id)


def _score_topk(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    k: int,
    k1: float,
    b: float,
    doc_id: str = "doc_id",
) -> DataFrame:
    """Shared BM25 scoring tail: (doc, term, tf) postings already pruned to
    the query terms + per-doc lengths + a 1-row (n_docs, total_dl) stats
    relation → micro-scaled integer-summed top-k. Both the scan-time path
    (``bm25_top_k``) and the materialized-index path
    (``bm25_indexed_top_k``) end here, so their scores are identical by
    construction."""
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


# ---------------------------------------------------------------------------
# Materialized inverted index — the "tokenize once, query many times" shape
# the module docstring names as the production path. Three relations:
#
#   {prefix}_postings (doc_id, token, tf)  bucketed + sorted by token
#   {prefix}_doclen   (doc_id, dl)         bucketed by doc_id
#   {prefix}_stats    (batch, n_docs, total_dl)  one row per ingest batch
#
# Per-query cost against the index is proportional to the postings of the
# QUERY terms only: the token filter pushes down into the parquet scan
# (bucket files are sorted by token, so row-group min/max stats skip almost
# everything), df comes from those same pruned postings, and the corpus
# stats are an associative sum over the batch rows — so per-day APPENDS are
# just three appends, no rebuild, and the scores stay bit-identical to the
# scan-time path because both end in _score_topk.
# ---------------------------------------------------------------------------


def _index_relations(
    docs: DataFrame, doc_id: str, text_col: str, batch: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    toks = docs.select(
        F.col(doc_id), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    postings = toks.groupBy(doc_id, "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = toks.groupBy(doc_id).agg(F.count("*").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ).select(F.lit(batch).alias("batch"), "n_docs", "total_dl")
    return postings, dl, stats


def _drop_stale_table(spark: SparkSession, table: str) -> None:
    """Drop ``table`` AND its warehouse location. The default in-memory
    catalog forgets tables across sessions while their warehouse
    directories persist, so a rebuild in a fresh session would otherwise
    die with LOCATION_ALREADY_EXISTS."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)


def build_bm25_index(
    spark: SparkSession,
    docs: DataFrame,
    prefix: str,
    num_buckets: int = 16,
    doc_id: str = "doc_id",
    text_col: str = "text",
    batch: str = "full",
) -> None:
    """Tokenize the corpus ONCE and land the inverted index as bucketed
    managed tables (see sources/writers.py::write_bucketed_table for the
    pay-one-shuffle-then-join-free rationale)."""
    from telemetry_parquet_spark.sources.writers import write_bucketed_table

    for suffix in ("postings", "doclen", "stats"):
        _drop_stale_table(spark, f"{prefix}_{suffix}")
    postings, dl, stats = _index_relations(docs, doc_id, text_col, batch)
    write_bucketed_table(
        postings, f"{prefix}_postings", ["token"], num_buckets,
        sort_cols=["token"],
    )
    write_bucketed_table(dl, f"{prefix}_doclen", [doc_id], num_buckets)
    stats.coalesce(1).write.mode("overwrite").saveAsTable(f"{prefix}_stats")


def append_bm25_partition(
    spark: SparkSession,
    docs: DataFrame,
    prefix: str,
    batch: str,
    num_buckets: int = 16,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental per-day append: tokenize only the NEW partition and
    append its postings / doc lengths / 1-row batch stats. Document
    frequency and corpus stats need no rebuild — df is recomputed per query
    from the pruned postings, and the stats relation sums associatively
    over batch rows. Assumes doc_ids are append-only (a re-ingested day
    should overwrite its batch instead)."""
    postings, dl, stats = _index_relations(docs, doc_id, text_col, batch)
    (
        postings.write.mode("append")
        .bucketBy(num_buckets, "token")
        .sortBy("token")
        .saveAsTable(f"{prefix}_postings")
    )
    (
        dl.write.mode("append")
        .bucketBy(num_buckets, doc_id)
        .saveAsTable(f"{prefix}_doclen")
    )
    stats.coalesce(1).write.mode("append").saveAsTable(f"{prefix}_stats")


def bm25_indexed_top_k(
    spark: SparkSession,
    prefix: str,
    query_terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    doc_id: str = "doc_id",
) -> DataFrame:
    """Top-k BM25 against a materialized index: reads ONLY the query
    terms' postings (isin filter pushed into the sorted bucketed scan),
    never re-tokenizes the corpus. Bit-identical to ``bm25_top_k`` on the
    same corpus (same _score_topk tail; asserted in tests)."""
    tf = spark.table(f"{prefix}_postings").where(
        F.col("token").isin(list(query_terms))
    )
    dl = spark.table(f"{prefix}_doclen")
    stats = spark.table(f"{prefix}_stats").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_dl").cast("long").alias("total_dl"),
    )
    return _score_topk(tf, dl, stats, k=k, k1=k1, b=b, doc_id=doc_id)


def ensure_bm25_index(
    spark: SparkSession, sf_dir: str, num_buckets: int = 16
) -> str:
    """Build-or-reuse the documents index for ``sf_dir`` in the session
    warehouse. A FINGERPRINT of the source parquet (path + total bytes +
    max mtime) is stored alongside the stats rows; a mismatch (regenerated
    testdata, different sf_dir at the same prefix) forces a rebuild, so a
    stale warehouse can never serve a fresh corpus."""
    import os
    import re

    from telemetry_parquet_spark.sources.tables import load_table

    src = os.path.join(sf_dir, "documents.parquet")
    parts = (
        [src]
        if os.path.isfile(src)
        else [
            os.path.join(src, f)
            for f in sorted(os.listdir(src))
            if not f.startswith(("_", "."))
        ]
    )
    st = [os.stat(p) for p in parts]
    fp = f"{src}|{sum(s.st_size for s in st)}|{max(s.st_mtime_ns for s in st)}"

    prefix = "bm25_idx_" + re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir).strip("_")
    meta = f"{prefix}_meta"
    if spark.catalog.tableExists(meta):
        stored = spark.table(meta).first()
        if stored is not None and stored["fingerprint"] == fp:
            return prefix
    docs = load_table(spark, sf_dir, "documents")
    build_bm25_index(spark, docs, prefix, num_buckets=num_buckets)
    _drop_stale_table(spark, meta)
    spark.createDataFrame([(fp,)], ["fingerprint"]).coalesce(1).write.mode(
        "overwrite"
    ).saveAsTable(meta)
    return prefix
