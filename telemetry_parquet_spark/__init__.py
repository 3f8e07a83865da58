"""telemetry_parquet_spark — a PySpark-native analytics engine.

A brand-new engine (Spark 4 DataFrame / SQL / Catalyst) with the query and
data-processing capabilities of the telemetry-batch-view lineage of
vitillo/telemetry-parquet (surveyed in SURVEY.md), re-expressed Spark-first:

- ``sources``   — partitioned parquet/JSON scans, dynamic-overwrite sinks,
                  semi-structured (ping-style) JSON ingestion.
- ``functions`` — the scalar library (date normalization, domain parsing,
                  hashing/block ids, map/array helpers).
- ``operators`` — relational + aggregate operators (map-sum/first, row-first,
                  filtered pivot-sum, sorted/trimmed collect, HLL sketches,
                  incremental dedup, dataset comparator, top-k).
- ``plans``     — job orchestration (date ranges, observed metrics) and plan
                  introspection helpers (pushdown/broadcast assertions).
- ``streaming`` — Structured Streaming forms (watermark dedup, windows).
- ``datapipe``  — LLM-training-data operators (dedup families, similarity
                  search, text analysis, multimodal plumbing).
- ``queries``   — the named query registry consumed by ``__spark_entry__.py``
                  and cross-checked against a DuckDB oracle.
"""

from telemetry_parquet_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
