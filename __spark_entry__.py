"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``telemetry_parquet_spark/queries/`` — one entry
per implemented operator from SURVEY.md §2, each citing the reference
file:line it covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from telemetry_parquet_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the MainEventsView events
    flatten (SURVEY.md §3.2 — the reference's one pure-DataFrame job)."""
    from telemetry_parquet_spark.queries.semistructured import events_flatten

    return events_flatten(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for sketch/streaming/ML ops —
    the driver records a rows-only check for those)."""
    return all_oracles()
