"""End-to-end corpus curation: the composed training-data pipeline under
ONE exact oracle.

Every stage is an already-verified operator — exact dedup
(datapipe/dedup.py), Gopher-style quality rules (datapipe/text.py),
deterministic per-source caps (datapipe/boilerplate.py) — but a user of
this engine runs them CHAINED, and stage composition is where silent
contract drift hides (a column renamed, a filter reordered around a
window, a dedup running after the cap instead of before). This query
locks the composed semantics: dedup → quality filter → per-source cap,
with the oracle replaying the whole chain in DuckDB so the driver checks
the pipeline's final kept set, not just each stage in isolation.

Plan shape at 100 TB: one (hash, id) dedup shuffle, then pure
filter/projection (codegen, pushdown-friendly), then one stratum-window
shuffle for the cap — three exchanges total, text never shuffles after
the dedup reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_parquet_spark.queries.registry import query
from telemetry_parquet_spark.sources.tables import load_table

MIN_TOKENS = 20
MIN_STOPWORD_RATIO = 0.05
CAP_PER_SOURCE = 10
CAP_SALT = "e2e-v1"

_N_TOK = "len(list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0))"
_N_STOP = (
    "len(list_filter(string_split_regex(text, '\\s+'), "
    "t -> list_contains(['the','a','of','and','to','in','is','it'], lower(t))))"
)


@query(
    "corpus_e2e_curation",
    oracle=f"""
    WITH base AS (SELECT * FROM documents WHERE length(text) > 0),
    hashed AS (
      SELECT *, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
               AS content_md5
      FROM base
    ),
    dedup AS (
      SELECT * FROM hashed
      QUALIFY row_number() OVER (PARTITION BY content_md5
                                 ORDER BY doc_id) = 1
    ),
    quality AS (
      SELECT * FROM dedup
      WHERE {_N_TOK} >= {MIN_TOKENS}
        AND CAST({_N_STOP} AS DOUBLE) / {_N_TOK} >= {MIN_STOPWORD_RATIO}
    ),
    capped AS (
      SELECT * FROM quality
      QUALIFY row_number() OVER (
        PARTITION BY source
        ORDER BY md5(CAST(doc_id AS VARCHAR) || '{CAP_SALT}'), doc_id
      ) <= {CAP_PER_SOURCE}
    )
    SELECT doc_id, source, lang, content_md5 FROM capped
    """,
)
def corpus_e2e_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → exact-dedup (keep earliest per normalized-content md5)
    → Gopher-style quality gate → deterministic per-source cap; returns
    the curated kept set with its content keys."""
    from telemetry_parquet_spark.datapipe.boilerplate import cap_per_stratum
    from telemetry_parquet_spark.datapipe.dedup import content_hash, exact_dedup
    from telemetry_parquet_spark.datapipe.text import quality_features

    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    deduped = exact_dedup(docs)
    feats = quality_features(deduped)
    kept = feats.where(
        (F.col("q_n_tokens") >= MIN_TOKENS)
        & (F.col("q_stopword_ratio") >= MIN_STOPWORD_RATIO)
    )
    capped = cap_per_stratum(
        kept, "source", "doc_id", k=CAP_PER_SOURCE, salt=CAP_SALT
    )
    return capped.select(
        "doc_id", "source", "lang", content_hash("text").alias("content_md5")
    )


CHUNK_W = 64  # window (tokens per chunk)
CHUNK_S = 48  # stride (CHUNK_W - CHUNK_S = 16-token overlap)


@query(
    "chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> length(x) > 0) AS ts
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST(len(ts[i*{CHUNK_S}+1 : i*{CHUNK_S}+{CHUNK_W}]) AS INT)
             AS n_tokens,
           md5(array_to_string(ts[i*{CHUNK_S}+1 : i*{CHUNK_S}+{CHUNK_W}], ' '))
             AS chunk_md5
    FROM toks,
         LATERAL unnest(range(0,
           (greatest(len(ts) - {CHUNK_W}, 0) + {CHUNK_S - 1}) // {CHUNK_S} + 1
         )) AS u(i)
    WHERE len(ts) > 0
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: every document becomes overlapping
    {CHUNK_W}-token chunks on a {CHUNK_S}-token stride — the pretraining /
    RAG prep step between curation and ``pack_sequences``. One codegen
    ``transform``+``explode`` per document (no join, no window function);
    the chunk count per doc is the integer ``ceil(max(n-W,0)/S)+1``, so
    the last chunk always covers the tail and every token lands in ≥ 1
    chunk. Chunk content is gated by md5 of the space-joined tokens."""
    from telemetry_parquet_spark.datapipe.lm import doc_token_arrays

    docs = load_table(spark, sf_dir, "documents")
    toks = doc_token_arrays(docs).where(F.size("ts") > 0)
    n_last = f"(greatest(size(ts) - {CHUNK_W}, 0) + {CHUNK_S - 1}) div {CHUNK_S}"
    # posexplode keeps the chunk index without a second pass
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST({n_last} AS INT)),"
                f" i -> slice(ts, i * {CHUNK_S} + 1, {CHUNK_W}))"
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("chunk").cast("int").alias("n_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
    )


@query(
    "footer_stats_lineitem",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN(l_quantity) AS min_l_quantity,
           MIN(l_extendedprice) AS min_l_extendedprice,
           MAX(l_quantity) AS max_l_quantity,
           MAX(l_extendedprice) AS max_l_extendedprice
    FROM lineitem
    """,
)
def footer_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table stats answered from parquet footer metadata only (DSv2
    aggregate pushdown — the scan reads row-group statistics, not rows;
    sources/writers.py::footer_stats raises if the fast path did not
    engage, so a green row here PROVES the scan-free plan)."""
    import os

    from telemetry_parquet_spark.sources.writers import footer_stats

    return footer_stats(
        spark,
        os.path.join(sf_dir, "lineitem.parquet"),
        min_cols=("l_quantity", "l_extendedprice"),
        max_cols=("l_quantity", "l_extendedprice"),
    )


BLOCKLIST = ("slow", "spill", "skew")
BLOCK_PCT = 3  # keep iff blocked tokens <= 3% of tokens (integer compare)


@query(
    "blocklist_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> length(x) > 0) AS ts
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(len(ts) AS INT) AS n_tokens,
           CAST(len(list_filter(ts,
                t -> list_contains(['slow','spill','skew'], t))) AS INT)
             AS n_blocked,
           len(list_filter(ts,
                t -> list_contains(['slow','spill','skew'], t))) * 100
             <= len(ts) * {BLOCK_PCT} AS kept
    FROM toks
    """,
)
def blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Badwords-list density filter (the UT1-style lexicon gate of a web
    curation pipeline): per-document blocked-token count and a keep flag at
    a {BLOCK_PCT}% density cutoff, compared in pure integer arithmetic
    (``n_blocked*100 <= n_tokens*{BLOCK_PCT}``). The blocklist inlines as
    an array literal — a map-only pass, no join, no Python."""
    from telemetry_parquet_spark.datapipe.scrub import blocklist_hits

    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    cols = blocklist_hits("text", BLOCKLIST)
    return docs.select(
        "doc_id",
        cols["n_tokens"].alias("n_tokens"),
        cols["n_blocked"].alias("n_blocked"),
    ).withColumn(
        "kept", F.col("n_blocked") * 100 <= F.col("n_tokens") * BLOCK_PCT
    )


def _skew_oracle_arm(table: str, key: str) -> str:
    return f"""
    SELECT '{table}.{key}' AS keyspace,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_cnt,
           ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 6) AS skew_ratio
    FROM (SELECT COUNT(*) AS c FROM {table} GROUP BY {key})
    """


@query(
    "skew_report",
    oracle=" UNION ALL ".join(
        _skew_oracle_arm(t, k)
        for t, k in (
            ("orders", "o_custkey"),
            ("lineitem", "l_orderkey"),
            ("events", "user_id"),
        )
    ),
)
def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key pre-flight: skew profiles (rows, distinct keys, hottest
    key, max/mean ratio) for the three join/agg keys the workload shuffles
    on most — the diagnosis that decides between a plain groupBy, salting
    (operators/skew.py::salted_agg), or AQE skew-join reliance."""
    from telemetry_parquet_spark.operators.skew import key_skew_profile

    parts = [
        key_skew_profile(load_table(spark, sf_dir, t), k, f"{t}.{k}")
        for t, k in (
            ("orders", "o_custkey"),
            ("lineitem", "l_orderkey"),
            ("events", "user_id"),
        )
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
