"""Sequence packing / context-window chunking — the step between a cleaned
corpus and training rows: split each document into fixed-size token chunks
with overlap, then pack chunks into training rows under a token budget.

Design for 100 TB:
- Chunking is a pure per-row array expression (``sequence`` → ``transform``
  → ``posexplode``): no shuffle, no Python, whole-stage codegen.
- Packing needs a sequential scan in principle; a GLOBAL greedy pack would
  be a single-partition window — the classic scale killer. Instead rows
  are sharded into ``n_buckets`` deterministic buckets (``doc_id mod
  n_buckets``) and packed per bucket with a window cumcount — ``n_buckets``
  independent window partitions running in parallel, each pack drawn from
  exactly one bucket. Determinism: the within-bucket order is the total
  order (doc_id, chunk_idx).
- The budget bound is exact, not statistical: every chunk carries at most
  ``chunk_size`` tokens, so capping a pack at ``budget // chunk_size``
  chunks guarantees ``sum(tokens) <= budget`` per pack (a cumulative-sum
  assignment can overshoot the boundary by up to one chunk; the fixed
  chunk-count cap cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from telemetry_parquet_spark.datapipe import spread
from telemetry_parquet_spark.datapipe.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 16,
    overlap: int = 4,
) -> DataFrame:
    """Split each document's whitespace tokens into chunks of at most
    ``chunk_size`` tokens starting every ``stride = chunk_size - overlap``
    tokens: consecutive chunks share their ``overlap`` boundary tokens (so
    a training window never severs context at a hard edge), and dropping
    the first ``overlap`` tokens of every chunk but the first reconstructs
    the document exactly (property-tested).

    Returns (id, chunk_idx, chunk_text, n_tokens) — one row per chunk, all
    per-row array arithmetic, no shuffle."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap ({overlap}) < chunk_size ({chunk_size})")
    stride = chunk_size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        1 + F.ceil((n - chunk_size) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_size),
    )
    return (
        spread(df)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__toks"))
        .select(
            F.col(id_col),
            "chunk_idx",
            F.array_join("__toks", " ").alias("chunk_text"),
            F.size("__toks").alias("n_tokens"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    budget: int = 64,
    chunk_size: int = 16,
    n_buckets: int = 8,
) -> DataFrame:
    """Assign every chunk a (bucket, pack_id) such that each pack holds at
    most ``budget`` tokens: packs take ``budget // chunk_size`` chunks in
    (id, chunk_idx) order within a deterministic ``id mod n_buckets``
    bucket. ``n_buckets`` is the packing parallelism — one window partition
    each; size it to cores (local) or executors×cores (cluster), it never
    changes which tokens end up together within a bucket."""
    per_pack = budget // chunk_size
    if per_pack < 1:
        raise ValueError(f"budget ({budget}) must fit a chunk ({chunk_size})")
    bucket = F.pmod(F.col(id_col), F.lit(n_buckets))
    w = W.partitionBy("bucket").orderBy(F.col(id_col), F.col("chunk_idx"))
    return (
        chunks.withColumn("bucket", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "pack_id", F.floor((F.col("__rn") - 1) / per_pack).cast("long")
        )
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 16,
    overlap: int = 4,
    budget: int = 64,
    n_buckets: int = 8,
) -> DataFrame:
    """chunk → pack → one summary row per training pack: chunk count, total
    tokens (provably <= budget), and the md5 of the in-order packed text —
    the digest a downstream writer would emit, and what the DuckDB oracle
    recomputes to prove byte-exact packing."""
    chunks = chunk_documents(df, id_col, text_col, chunk_size, overlap)
    packed = pack_chunks(chunks, id_col, budget, chunk_size, n_buckets)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(id_col), "chunk_idx", "chunk_text"))
    )
    return packed.groupBy("bucket", "pack_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").alias("total_tokens"),
        F.md5(
            F.array_join(F.transform(ordered, lambda s: s["chunk_text"]), " ")
        ).alias("packed_md5"),
    )
