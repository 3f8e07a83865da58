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
